"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (godal has no text surface) — these are the
training-pipeline extensions the engine carries as first-class operators
over the `documents` table:

  * exact_dedup        — md5 hash groupBy (one shuffle on the hash)
  * minhash_lsh_dedup  — shingle → minhash → band-bucket join; candidate
    pairs verified by true Jaccard. Only bucket-collision pairs are ever
    joined: no O(n²) pair enumeration.
  * simhash_dedup      — 64-bit simhash; Hamming-band (4x16-bit chunks)
    bucket join finds pairs within distance ≤ 3 (pigeonhole over chunks
    guarantees recall for d ≤ 3 with 4 chunks).
  * ngram_jaccard_join — exact n-gram Jaccard over candidate pairs.

All hashing is deterministic (no Python hash()); heavy lifting stays in
built-in functions (xxhash64, explode, groupBy) — Python only where a
per-doc loop is unavoidable, and then Arrow-batched.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: keep lowest id, count copies."""
    return (docs.withColumn("text_hash", F.md5(F.col(text_col)))
            .groupBy("text_hash")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("n_copies")))


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------


def with_shingles(docs: DataFrame, text_col: str = "text", k: int = 5,
                  word: bool = True) -> DataFrame:
    """Adds `shingles: array<string>` — distinct k-grams (word or char)."""
    if word:
        toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        n = F.size(toks)
        idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
        sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    else:
        txt = F.lower(F.col(text_col))
        n = F.length(txt)
        idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
        sh = F.transform(idx, lambda i: F.substring(txt, 1, 0))  # placeholder
        sh = F.expr(f"transform(sequence(1, greatest(length(lower({text_col})) - {k} + 1, 1)),"
                    f" i -> substr(lower({text_col}), i, {k}))")
    return docs.withColumn("shingles", F.array_distinct(sh))


def _minhash_params(num_hashes: int, seed: int = 42):
    """Multiply-shift universal hash family over uint64 wrap-around
    arithmetic (odd multipliers) — fully numpy-vectorizable, unlike the
    classic (a*x+b) mod (2^61-1) which needs 128-bit intermediates."""
    rng = np.random.default_rng(seed)
    a = (rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64)
    return a, b


def with_minhash(docs: DataFrame, num_hashes: int = 64, seed: int = 42) -> DataFrame:
    """Adds `minhash: array<long>` from the `shingles` column.

    Base hash is Spark's xxhash64 (JVM); the num_hashes mixes run as ONE
    numpy (num_hashes × n_shingles) uint64 outer product per doc inside
    the Arrow batch — no per-element Python.
    """
    a, b = _minhash_params(num_hashes, seed)
    docs = docs.withColumn(
        "__base", F.transform(F.col("shingles"), lambda s: F.xxhash64(s)))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def mh(base: pd.Series) -> pd.Series:
        out = []
        empty = [0] * len(a)
        with np.errstate(over="ignore"):
            for arr in base:
                if arr is None or len(arr) == 0:
                    out.append(empty)
                    continue
                x = np.asarray(arr, dtype=np.int64).view(np.uint64)
                mixed = a[:, None] * x[None, :] + b[:, None]  # uint64 wrap
                out.append(mixed.min(axis=1).view(np.int64).tolist())
        return pd.Series(out)

    return docs.withColumn("minhash", mh(F.col("__base"))).drop("__base")


def minhash_lsh_candidates(docs: DataFrame, bands: int = 16,
                           id_col: str = "doc_id") -> DataFrame:
    """Band the signature, bucket-join: (id_a, id_b) candidate pairs.

    bands × rows = num_hashes; a pair collides if ANY band matches —
    the standard S-curve. Join is a self-equi-join on (band, bucket_hash);
    each bucket's pairs are generated bucket-locally (groupBy collect of
    ids per bucket, exploded) so the shuffle key is the bucket, never the
    pair space.
    """
    nh_row = docs.select(F.size("minhash").alias("n")).first()
    rows_per_band = nh_row["n"] // bands
    banded = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bidx: F.xxhash64(
                    F.concat_ws(",", F.transform(
                        F.slice(F.col("minhash"), bidx * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string")))))).alias("band", "bucket"))
    grp = banded.groupBy("band", "bucket").agg(
        F.sort_array(F.collect_set("__id")).alias("ids"))
    grp = grp.filter(F.size("ids") > 1)
    pairs = grp.select(
        F.explode(F.expr(
            "flatten(transform(ids, (x, i) -> "
            "transform(slice(ids, i + 2, size(ids) - i - 1), y -> struct(x as a, y as b))))"
        )).alias("p"))
    return pairs.select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b")).distinct()


def jaccard_verify(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                   threshold: float = 0.8) -> DataFrame:
    """Exact Jaccard over candidate pairs via the shingle arrays."""
    a = docs.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = docs.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    j = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    j = j.withColumn("jaccard", F.when(union > 0, inter / union).otherwise(F.lit(1.0)))
    return (j.filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


def minhash_lsh_dedup(docs: DataFrame, *, k: int = 5, num_hashes: int = 64,
                      bands: int = 16, threshold: float = 0.8,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Full near-dup pipeline → verified (id_a, id_b, jaccard) pairs."""
    d = with_minhash(with_shingles(docs, text_col, k=k), num_hashes=num_hashes)
    d = d.persist()
    cand = minhash_lsh_candidates(d, bands=bands, id_col=id_col)
    return jaccard_verify(d, cand, id_col=id_col, threshold=threshold)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def with_simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit simhash over word tokens (xxhash64 base, Arrow bit-vote)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    docs = docs.withColumn("__th", F.transform(toks, lambda t: F.xxhash64(t)))

    @F.pandas_udf(T.LongType())
    def sh(hashes: pd.Series) -> pd.Series:
        out = []
        for arr in hashes:
            if arr is None or len(arr) == 0:
                out.append(0)
                continue
            h = np.asarray(arr, dtype=np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
            votes = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
            val = 0
            for i in range(64):
                if votes[i] > 0:
                    val |= 1 << i
            out.append(val - (1 << 64) if val >= (1 << 63) else val)
        return pd.Series(out, dtype="int64")

    return docs.withColumn("simhash", sh(F.col("__th"))).drop("__th")


def simhash_candidates(docs: DataFrame, id_col: str = "doc_id",
                       max_hamming: int = 3) -> DataFrame:
    """Pigeonhole bucket join: 4 x 16-bit chunks — any pair within
    Hamming distance ≤ 3 shares at least one identical chunk."""
    chunks = F.sequence(F.lit(0), F.lit(3))
    banded = docs.select(
        F.col(id_col).alias("__id"), F.col("simhash"),
        F.explode(chunks).alias("chunk"))
    banded = banded.withColumn(
        "key", F.expr("shiftright(simhash, chunk * 16) & 65535"))
    grp = (banded.groupBy("chunk", "key")
           .agg(F.sort_array(F.collect_set(F.struct("__id", "simhash"))).alias("items"))
           .filter(F.size("items") > 1))
    pairs = grp.select(F.explode(F.expr(
        "flatten(transform(items, (x, i) -> "
        "transform(slice(items, i + 2, size(items) - i - 1), "
        "y -> struct(x.__id as id_a, y.__id as id_b, x.simhash as h_a, y.simhash as h_b))))"
    )).alias("p")).select("p.*").distinct()
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (pairs.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def simhash_dedup(docs: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    return simhash_candidates(with_simhash(docs, text_col), id_col, max_hamming)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dedup(emb: DataFrame, *, id_col: str = "vec_id",
                    vec_col: str = "embedding", threshold: float = 0.95,
                    n_planes: int = 16, seed: int = 42) -> DataFrame:
    """Near-duplicate vectors by cosine ≥ threshold.

    Candidates from random-hyperplane LSH (sign sketch) buckets, verified
    exactly. For high thresholds most duplicate pairs share the full
    sketch; recall is boosted by also bucketing on 2 half-sketches.
    """
    from godal_spark.operators.similarity import with_hyperplane_sketch

    d = with_hyperplane_sketch(emb, vec_col=vec_col, n_planes=n_planes, seed=seed)
    half = n_planes // 2
    buckets = d.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"),
        F.explode(F.array(
            F.concat(F.lit("f:"), F.col("sketch").cast("string")),
            F.concat(F.lit("l:"), (F.col("sketch").bitwiseAND(F.lit((1 << half) - 1))).cast("string")),
            F.concat(F.lit("h:"), F.shiftright(F.col("sketch"), half).cast("string")),
        )).alias("bucket"))
    grp = (buckets.groupBy("bucket")
           .agg(F.collect_list(F.struct("__id", "__vec")).alias("items"))
           .filter(F.size("items") > 1))

    def verify(pdf_iter):
        for pdf in pdf_iter:
            rows = {"id_a": [], "id_b": [], "cosine": []}
            for items in pdf["items"]:
                ids = np.array([it["__id"] for it in items])
                order = np.argsort(ids)
                ids = ids[order]
                mat = np.array([items[i]["__vec"] for i in order], dtype=np.float64)
                norms = np.linalg.norm(mat, axis=1)
                sims = (mat @ mat.T) / np.outer(norms, norms)
                iu = np.triu_indices(len(ids), k=1)
                keep = sims[iu] >= threshold
                rows["id_a"].extend(ids[iu[0][keep]].tolist())
                rows["id_b"].extend(ids[iu[1][keep]].tolist())
                rows["cosine"].extend(np.round(sims[iu][keep], 6).tolist())
            yield pd.DataFrame(rows)

    pairs = grp.mapInPandas(verify, schema="id_a long, id_b long, cosine double")
    return pairs.dropDuplicates(["id_a", "id_b"])
