#!/usr/bin/env python
"""Round-6 measurement harness (guide §1) — NOT part of the driver contract.

bench.py is FROZEN for measurement; this file holds the extra
instrumentation the optimization round needs:

  * per-query isolated timing with the noop sink (guide §1.4), labelled
    jobs (§1.5), N trials with /proc/loadavg annotations;
  * .explain("formatted") capture for every benched query →
    plans/r06/<query>_<suffix>.txt;
  * a deterministic sf1.0-scale synthetic table generator matching the
    /root/testdata schema+distributions, so optimizations are validated
    at the driver's escalated measurement scale (BENCH_r05 ran sf=1.0),
    not just at sf0.1.

Usage:
  python bench_extra.py --gen /root/sf1 --scale 10           # make sf1.0-ish data
  python bench_extra.py --time --sf-dir /root/testdata/sf0.1 --trials 3
  python bench_extra.py --time --queries knn,dedup_minhash --sf-dir /root/sf1
  python bench_extra.py --plans plans/r06 --suffix before --sf-dir /root/testdata/sf0.1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BENCH_QUERIES  # noqa: E402  (frozen list, read-only import)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _loadavg() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


# ---------------------------------------------------------------------------
# deterministic sf-scaled synthetic tables (same schema/distributions as
# /root/testdata — seed-stable, perf-measurement only, NOT oracle data)
# ---------------------------------------------------------------------------

_VOCAB = ("a agg batch big column customer data dup fast filter group hash join "
          "key line order part plan query row scan slow small sort spark stream "
          "table the value vector wide").split()


def gen_tables(out_dir: str, scale: int = 10) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)

    def write(name: str, table: "pa.Table") -> None:
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"),
                       row_group_size=200_000)
        print(f"wrote {name}: {table.num_rows} rows")

    # nation / region: copy from sf0.1 (tiny, fixed)
    import pyarrow.dataset as ds
    for t in ("nation", "region"):
        write(t, ds.dataset(f"/root/testdata/sf0.1/{t}.parquet").to_table())

    n_part = 20_000 * scale
    pk = np.arange(n_part, dtype=np.int64)
    write("part", pa.table({
        "p_partkey": pk,
        "p_name": pa.array([f"part{i % 1000}" for i in range(n_part)]),
        "p_brand": pa.array([f"Brand#{i % 25}" for i in range(n_part)]),
        "p_type": pa.array([f"type{i % 150}" for i in range(n_part)]),
        "p_size": pa.array((pk % 50 + 1).astype(np.int64)),
        "p_retailprice": pa.array(np.round(900 + (pk % 1000) * 0.1, 2)),
    }))

    n_cust = 15_000 * scale
    ck = np.arange(n_cust, dtype=np.int64)
    write("customer", pa.table({
        "c_custkey": ck,
        "c_name": pa.array([f"Customer#{i}" for i in range(n_cust)]),
        "c_nationkey": pa.array((ck % 25).astype(np.int64)),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_cust), 2)),
        "c_mktsegment": pa.array([("BUILDING", "AUTOMOBILE", "MACHINERY",
                                   "HOUSEHOLD", "FURNITURE")[i % 5]
                                  for i in range(n_cust)]),
    }))

    n_supp = 1_000 * scale
    sk = np.arange(n_supp, dtype=np.int64)
    write("supplier", pa.table({
        "s_suppkey": sk,
        "s_name": pa.array([f"Supplier#{i}" for i in range(n_supp)]),
        "s_nationkey": pa.array((sk % 25).astype(np.int64)),
        "s_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_supp), 2)),
    }))

    n_ord = 150_000 * scale
    n_li = 600_000 * scale
    ok = rng.integers(0, n_ord, n_li).astype(np.int64)
    write("lineitem", pa.table({
        "l_orderkey": ok,
        "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": (np.arange(n_li) % 7 + 1).astype(np.int64),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["N", "A", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array([f"199{i % 8}-{(i % 12) + 1:02d}-{(i % 28) + 1:02d}"
                                for i in rng.integers(0, 10**6, n_li)]),
    }))
    write("orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        "o_totalprice": np.round(rng.uniform(900, 500000, n_ord), 2),
    }))

    # documents: ~54-token texts from the 31-word vocab, ~0.2% exact dups
    n_docs = 5_000 * scale
    lens = rng.integers(10, 101, n_docs)
    vocab = np.array(_VOCAB)
    texts = []
    for i in range(n_docs):
        toks = vocab[rng.integers(0, len(vocab), lens[i])]
        texts.append(" ".join(toks))
    # a few exact duplicates like the source corpus
    for i in range(0, n_docs, 625):
        if i + 1 < n_docs:
            texts[i + 1] = texts[i]
    langs = np.array(["en", "zh", "es", "fr", "de"])
    lang_idx = rng.choice(5, n_docs, p=[0.41, 0.15, 0.15, 0.15, 0.14])
    write("documents", pa.table({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": pa.array(texts),
        "lang": pa.array(langs[lang_idx]),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    n_emb = 2_000 * scale
    emb = rng.normal(0, 0.1, (n_emb, 64))
    write("embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(emb)),
        "label": rng.integers(0, 10, n_emb).astype(np.int64),
    }))

    n_ev = 100_000 * scale
    base = np.datetime64("2024-01-01T00:00:00")
    offs = np.sort(rng.uniform(0, 30 * 86400, n_ev))
    types = np.array(["view", "click", "purchase", "signup", "error"])
    write("events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": pa.array(base + (offs * 1e6).astype("timedelta64[us]")),
        "user_id": rng.integers(0, 1_500 * scale, n_ev).astype(np.int64),
        "event_type": pa.array(types[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.uniform(0, 200, n_ev), 2),
        "props": pa.array([f'{{"k": {int(v)}}}' for v in rng.integers(0, 100, n_ev)]),
    }))
    with open(os.path.join(out_dir, "_DONE"), "w") as fh:
        fh.write("ok\n")


# ---------------------------------------------------------------------------
# timing + plan capture
# ---------------------------------------------------------------------------

def _session():
    from godal_spark.session import get_spark

    return get_spark("bench-extra", cores=CPUS,
                     shuffle_partitions=max(CPUS, 32))


def time_queries(sf_dir: str, names: list[str], trials: int) -> dict:
    import __spark_entry__ as entry_mod

    spark = _session()
    qs = entry_mod.queries()
    spark.read.parquet(f"{sf_dir}/part.parquet").count()
    spark.range(CPUS * 2, numPartitions=CPUS * 2) \
        .mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    warm_dir = "/root/testdata/sf0.001"
    out: dict[str, dict] = {}
    for name in names:
        try:
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # warm-up failure is informative here
            print(f"WARM FAIL {name}: {exc}", file=sys.stderr)
        walls = []
        for t in range(trials):
            la0 = _loadavg()
            spark.sparkContext.setJobDescription(f"r06:{name}:t{t}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"best": min(walls), "walls": walls,
                     "load_after": _loadavg()}
        print(json.dumps({name: out[name]}))
    spark.stop()
    return out


def capture_plans(sf_dir: str, names: list[str], out_dir: str, suffix: str) -> None:
    import contextlib
    import io

    import __spark_entry__ as entry_mod

    os.makedirs(out_dir, exist_ok=True)
    spark = _session()
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"plan captured: {name}")
    spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", help="generate synthetic tables into DIR")
    ap.add_argument("--scale", type=int, default=10)
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--plans", help="capture explain(formatted) into DIR")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", help="comma list; default = bench set")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    names = args.queries.split(",") if args.queries else list(BENCH_QUERIES)
    if args.gen:
        gen_tables(args.gen, args.scale)
    if args.plans:
        capture_plans(args.sf_dir, names, args.plans, args.suffix)
    if args.time:
        res = time_queries(args.sf_dir, names, args.trials)
        print(json.dumps({"sf_dir": args.sf_dir, "queries": res}))
