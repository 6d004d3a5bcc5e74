"""Text-analysis operators for training-data pipelines (documents table).

All JVM-side built-ins except language-ID's score matrix (Arrow batch).

  * with_token_stats     — token count, distinct tokens, char classes
  * with_quality_score   — composite quality heuristics (length, punct
    ratio, stopword ratio, mean word length, repetition)
  * with_lang_id         — character n-gram + stopword profile scoring
  * with_fingerprint     — 64-bit rolling-hash document fingerprint
  * token_count_bpe_ish  — GPT-2-style regex pretokenizer count (the
    standard `'s|'t|...|\\s+` pattern) as a proxy for BPE token counts
  * repetition_stats     — Gopher-style n-gram repetition fractions
  * decontaminate        — GPT-3-style benchmark n-gram decontamination
    (broadcast benchmark gram set, map-side join)
  * pii_stats            — email/IPv4/phone detection + placeholder
    scrubbing (Java-regex/RE2 common-subset patterns)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "du", "que"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que", "del", "para"],
    "zh": [],  # ideographic: detected by script ratio, not stopwords
}


def with_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return (docs
            .withColumn("n_chars2", F.length(text_col).cast("long"))
            .withColumn("n_tokens", F.size(toks).cast("long"))
            .withColumn("n_distinct_tokens", F.size(F.array_distinct(toks)).cast("long"))
            .withColumn("n_punct", F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", "")).cast("long"))
            .withColumn("n_digits", F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", "")).cast("long"))
            .withColumn("mean_token_len",
                        F.when(F.size(toks) > 0,
                               F.aggregate(toks, F.lit(0.0),
                                           lambda acc, t: acc + F.length(t)) / F.size(toks))
                        .otherwise(F.lit(0.0))))


def with_quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality: penalize too-short/too-long, high punct or
    digit density, low vocabulary diversity — the usual pretraining
    filters (C4/Gopher-style heuristics, simplified)."""
    d = with_token_stats(docs, text_col)
    ntok = F.col("n_tokens").cast("double")
    len_score = F.least(ntok / 64.0, F.lit(1.0)) * F.least(F.lit(4096.0) / F.greatest(ntok, F.lit(1.0)), F.lit(1.0))
    punct_ratio = F.col("n_punct") / F.greatest(F.col("n_chars2"), F.lit(1))
    digit_ratio = F.col("n_digits") / F.greatest(F.col("n_chars2"), F.lit(1))
    diversity = F.col("n_distinct_tokens") / F.greatest(F.col("n_tokens"), F.lit(1))
    score = (F.least(len_score, F.lit(1.0))
             * (1 - F.least(punct_ratio * 4, F.lit(1.0)))
             * (1 - F.least(digit_ratio * 4, F.lit(1.0)))
             * F.least(diversity * 2, F.lit(1.0)))
    return d.withColumn("quality", F.round(score, 6))


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: stopword-profile hit rates + CJK script
    ratio, argmax over profiles. Arrow-batched; deterministic."""
    langs = sorted(STOPWORDS)
    profiles = {lg: set(ws) for lg, ws in STOPWORDS.items()}

    @F.pandas_udf(T.StringType())
    def lid(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not t:
                out.append("unknown")
                continue
            cjk = sum(1 for ch in t[:2000] if "一" <= ch <= "鿿")
            if cjk / max(len(t[:2000]), 1) > 0.05:
                out.append("zh")
                continue
            words = t.lower().split()
            if not words:
                out.append("unknown")
                continue
            best, best_score = "unknown", 0.0
            for lg in langs:
                prof = profiles[lg]
                if not prof:
                    continue
                score = sum(1 for w in words if w in prof) / len(words)
                if score > best_score:
                    best, best_score = lg, score
            out.append(best if best_score > 0.02 else "unknown")
        return pd.Series(out)

    return docs.withColumn("lang_pred", lid(F.col(text_col)))


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit content fingerprint: xxhash64 of the normalized text plus a
    rolling min-hash of 8-grams (winnowing-style) — JVM built-ins only."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    grams = F.expr(
        "transform(sequence(1, greatest(length(lower(regexp_replace(text, '\\\\s+', ' '))) - 7, 1)),"
        " i -> xxhash64(substr(lower(regexp_replace(text, '\\\\s+', ' ')), i, 8)))")
    return (docs.withColumn("fp_full", F.xxhash64(norm))
            .withColumn("fp_min", F.array_min(grams)))


def token_count_bpe_ish(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """GPT-2 pretokenizer regex count (proxy for BPE token count: every
    BPE token boundary is a subset of these pretoken boundaries)."""
    pat = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
    toks = F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)
    return docs.withColumn("n_pretokens", F.size(toks).cast("long"))


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1), token
    n-gram flavor: for each document the fraction of all word 2-grams
    taken by the single most frequent one (`top2gram_frac`), the
    fraction covered by 2-grams occurring more than once
    (`dup2gram_frac`), and the top-3-gram fraction (`top3gram_frac`).
    High values flag boilerplate / keyword-stuffed pages that survive
    per-token diversity checks.

    Fully relational — explode n-grams, one keyed groupBy per order —
    so it scales as an ordinary aggregation (no per-row Python, no
    driver state); documents with fewer than n tokens get 0.0.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    d = docs.withColumn("__toks", toks)
    n = F.size("__toks")

    def gram_metrics(order: int, top_name: str, dup_name: str | None):
        grams = F.when(
            n >= order,
            F.transform(F.sequence(F.lit(0), n - order),
                        lambda i: F.concat_ws(
                            " ", *[F.element_at("__toks", i + k + 1)
                                   for k in range(order)]))
        ).otherwise(F.array().cast("array<string>"))
        per_gram = (d.select(F.col(id_col), F.explode(grams).alias("__g"))
                    .groupBy(id_col, "__g").agg(F.count("*").alias("__c")))
        aggs = [
            (F.max("__c") / F.sum("__c")).alias(top_name)]
        if dup_name is not None:
            aggs.append(
                (F.sum(F.when(F.col("__c") > 1, F.col("__c"))
                       .otherwise(F.lit(0))) / F.sum("__c")).alias(dup_name))
        return per_gram.groupBy(id_col).agg(*aggs)

    g2 = gram_metrics(2, "top2gram_frac", "dup2gram_frac")
    g3 = gram_metrics(3, "top3gram_frac", None)
    out = (docs.join(g2, id_col, "left").join(g3, id_col, "left"))
    for c in ("top2gram_frac", "dup2gram_frac", "top3gram_frac"):
        out = out.withColumn(c, F.round(F.coalesce(F.col(c), F.lit(0.0)), 6))
    return out


def _norm_tokens(col) -> "F.Column":
    """ASCII-alnum normalization shared by decontamination: lowercase,
    split on runs of anything outside [a-z0-9], drop empties. The class
    is ASCII-only on purpose — DuckDB's string_split_regex applies the
    identical class, so the oracle tokenizes byte-for-byte the same."""
    toks = F.split(F.lower(col), "[^a-z0-9]+")
    return F.filter(toks, lambda t: t != "")


def decontaminate(docs: DataFrame, benchmark: DataFrame, *,
                  n: int = 8, id_col: str = "doc_id",
                  text_col: str = "text",
                  bench_text_col: str = "text") -> DataFrame:
    """Benchmark decontamination via n-gram overlap (the GPT-3 appendix-C
    / PaLM procedure): a training document is contaminated when any
    normalized token n-gram also occurs in the evaluation/benchmark
    corpus. Returns docs + `n_gram_hits` (doc n-gram instances that hit
    the benchmark set), `n_distinct_hits`, and `contaminated`.

    Scale shape: the benchmark gram set is DISTINCT'd and broadcast —
    eval suites are MBs against a 100-TB corpus, so the expensive side
    is a map-side hash join on the exploded doc grams (no shuffle),
    followed by one keyed aggregation. Grams are compared as xxhash64
    of the joined token string: the broadcast set carries 8 bytes per
    gram instead of the text.
    """

    def grams(df, col, with_id: bool):
        # with_id is EXPLICIT (round-5 ADVICE): the previous `df is docs`
        # object-identity test misrouted self-decontamination (passing
        # the same DataFrame as docs and benchmark made the benchmark
        # side carry doc_id, producing an ambiguous-column groupBy)
        d = df.withColumn("__toks", _norm_tokens(F.col(col)))
        sz = F.size("__toks")
        g = F.when(
            sz >= n,
            F.transform(
                F.sequence(F.lit(0), sz - n),
                lambda i: F.xxhash64(F.concat_ws(
                    " ", *[F.element_at("__toks", i + k + 1)
                           for k in range(n)])))
        ).otherwise(F.array().cast("array<bigint>"))
        return d.select(F.explode(g).alias("__gh"), *(
            [F.col(id_col)] if with_id else []))

    bench_grams = grams(benchmark, bench_text_col, with_id=False).distinct()
    doc_grams = grams(docs, text_col, with_id=True)
    hits = (doc_grams
            .join(F.broadcast(bench_grams), "__gh")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_gram_hits"),
                 F.countDistinct("__gh").alias("n_distinct_hits")))
    out = docs.join(hits, id_col, "left")
    return (out
            .withColumn("n_gram_hits",
                        F.coalesce("n_gram_hits", F.lit(0)).cast("bigint"))
            .withColumn("n_distinct_hits",
                        F.coalesce("n_distinct_hits",
                                   F.lit(0)).cast("bigint"))
            .withColumn("contaminated", F.col("n_distinct_hits") > 0))


PII_PATTERNS = {
    # Patterns are deliberately restricted to constructs whose match
    # semantics are identical between Java regex (Spark) and RE2
    # (DuckDB): character classes, bounded repetition, \b on ASCII —
    # no alternation ambiguity, no backreferences, no lookaround.
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+[0-9][0-9 ()-]{6,18}[0-9]",
}


def pii_stats(docs: DataFrame, text_col: str = "text",
              scrub: bool = True) -> DataFrame:
    """PII detection + scrubbing for training corpora: counts emails,
    IPv4 addresses, and international-format phone numbers per document
    and (with scrub=True) adds `text_scrubbed` with each span replaced
    by a typed placeholder. The n_email/n_ipv4/n_phone counts are all
    computed on the ORIGINAL text, so a span matching two patterns (an
    IPv4 embedded in an email host) is counted once per pattern — only
    the REPLACEMENT pass is sequential: emails are scrubbed before
    IPv4/phones, and the placeholders contain no digits or '@', so later
    passes never re-match inside earlier replacements (round-5 ADVICE
    wording fix; the DuckDB oracle counts the same way). All JVM
    built-ins (regexp_count / regexp_replace) — whole-stage codegen, no
    Python."""
    out = docs
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}",
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint"))
    if scrub:
        scrubbed = F.col(text_col)
        for name, pat in PII_PATTERNS.items():
            scrubbed = F.regexp_replace(scrubbed, pat,
                                        f"<{name.upper()}>")
        out = out.withColumn("text_scrubbed", scrubbed)
        residual = F.lit(0).cast("bigint")
        for name, pat in PII_PATTERNS.items():
            residual = residual + F.regexp_count(F.col("text_scrubbed"),
                                                 F.lit(pat))
        out = out.withColumn("n_residual", residual.cast("bigint"))
    return out
