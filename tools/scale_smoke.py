#!/usr/bin/env python
"""Scale smoke (VERDICT r06 task 5): do the 100 TB plan-level arguments
hold empirically one decade up from the bench scale?

Generates an sf1-equivalent dataset (10x sf0.1) by unioning K=10
key-shifted copies of the sf0.1 tables, then times the heaviest operators
at both scales and reports the runtime ratio against the 10x-linear ideal.
A ratio well above ~10 on a 32-core box flags super-linear behavior (a
pair-space blowup, an unbounded window, a driver-side collect that grew)
before a real cluster finds it.

Copy construction (deterministic, no RNG):
  - every key column shifts by copy_index * (max_key + 1), so joins stay
    consistent within a copy and never cross copies;
  - documents.text gets a per-copy word suffix (copy 0 unchanged), so the
    intra-copy duplicate/near-dup structure is preserved and replicated
    10x, while copies don't collide into mega-clusters (10x organic data
    has 10x clusters, not 10x-bigger clusters);
  - embeddings rotate by copy_index dimensions (same norms, fresh LSH
    buckets per copy) — vec-space density scales, geometry doesn't warp;
  - events keep their timestamps (10x traffic in the same window — the
    realistic shape for windowed/stateful operators).

Data lands in REPO/.scale_smoke/sf1 (gitignored, ~170 MB). Results print
as JSON and are meant to be transcribed into SCALE.md's smoke table.

Usage:
  python tools/scale_smoke.py [--gen-only] [--queries a,b,c] [--copies 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"


def _dst(copies: int) -> str:
    # 10 copies of sf0.1 = sf1; 100 copies = sf10 (the 100x-of-bench point)
    return os.path.join(REPO, ".scale_smoke", f"sf{copies // 10}")

# Key columns to shift per copy, per table. Dims without cross-copy joins
# at smoke-query granularity (region, nation) replicate un-shifted is NOT
# ok (duplicate PKs would corrupt joins), so they stay single-copy.
SINGLE_COPY = {"region", "nation"}
KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# The heaviest operators across families (VERDICT r06 task 5): dedup LSH +
# clustering, ANN composite index, distributed exact rank (twice), the
# rank-stat pair, M4, k-core, bootstrap.
DEFAULT_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_clusters_star",
    "ann_ivfpq_topk",
    "search_hybrid_rrf",
    "audience_rfm_segments",
    "stat_ks_two_sample",
    "stat_mann_whitney_u",
    "ts_m4_downsample",
    "graph_kcore_peel",
    "stat_bootstrap_se",
]


def _one_copy(df: DataFrame, name: str, i: int, shifts: dict[str, int]) -> DataFrame:
    out = df
    for col in KEY_SHIFTS.get(name, []):
        out = out.withColumn(col, F.col(col) + F.lit(i * shifts[col]))
    if name == "documents" and i > 0:
        # Per-copy word suffix: preserves intra-copy shingle structure,
        # kills cross-copy similarity (see module docstring).
        out = out.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.lit(f"·{i}")),
                ),
                " ",
            ),
        )
    if name == "embeddings" and i > 0:
        dim = 64
        r = i % dim
        if r:
            out = out.withColumn(
                "embedding",
                F.concat(
                    F.slice(F.col("embedding"), r + 1, dim - r),
                    F.slice(F.col("embedding"), 1, r),
                ),
            )
    return out


def generate(spark: SparkSession, copies: int) -> None:
    DST = _dst(copies)
    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    from chainhouse_spark.tables import TABLE_NAMES, load_table

    for name in TABLE_NAMES:
        df = load_table(spark, SRC, name)
        if name in SINGLE_COPY:
            df.write.parquet(f"{DST}/{name}.parquet")
            continue
        shifts = {}
        if KEY_SHIFTS.get(name):
            row = df.agg(
                *[
                    (F.max(F.col(c).cast("long")) + 1).alias(c)
                    for c in KEY_SHIFTS[name]
                ]
            ).collect()[0]
            shifts = row.asDict()
        parts = [_one_copy(df, name, i, shifts) for i in range(copies)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # Events ship as timestamp_ntz out of load_table; the raw file has
        # TIMESTAMP — write what load_table produced, load_table at the
        # smoke dir re-normalizes idempotently.
        out.write.parquet(f"{DST}/{name}.parquet")
        n = spark.read.parquet(f"{DST}/{name}.parquet").count()
        print(f"[gen] {name}: {n} rows", file=sys.stderr)


def run(spark: SparkSession, names: list[str], copies: int) -> dict:
    from chainhouse_spark.queries import QUERIES

    DST = _dst(copies)

    results = {}
    for name in names:
        fn = QUERIES[name]
        walls = {}
        for label, sf_dir in (("sf0.1", SRC), (f"sf{copies // 10}", DST)):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            walls[label] = round(best, 3)
        big = f"sf{copies // 10}"
        ratio = round(walls[big] / walls["sf0.1"], 2)
        results[name] = {
            "sf0.1_sec": walls["sf0.1"],
            f"{big}_sec": walls[big],
            "ratio": ratio,
            "ideal": float(copies),
        }
        print(f"[smoke] {name:28s} {walls['sf0.1']:7.3f}s -> "
              f"{walls[big]:7.3f}s  ratio {ratio:5.2f}x "
              f"(linear ideal <= {copies}x)", file=sys.stderr)
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen-only", action="store_true")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    from chainhouse_spark.session import build_spark

    spark = build_spark(app_name="scale-smoke")
    if not args.skip_gen:
        generate(spark, args.copies)
    if not args.gen_only:
        res = run(spark, [q for q in args.queries.split(",") if q], args.copies)
        print(json.dumps({"metric": "scale_smoke_ratios", "copies": args.copies,
                          "queries": res}))
    spark.stop()


if __name__ == "__main__":
    main()
