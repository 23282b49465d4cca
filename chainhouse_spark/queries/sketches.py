"""Sketch / heavy-hitter surface — ClickHouse `topK`, `uniqCombined`,
`quantileTDigest`-family parity (SURVEY.md §2.6 delegated query surface).

Three tiers:
- `topk_heavy_hitters`: EXACT top-k with a total-order tie-break — the
  correctness anchor (oracle-checked). At 100 TB the same plan holds: the
  count aggregate shuffles (key, partial-count) pairs only, and the final
  top-k is a driver-sized sort of |distinct keys| rows.
- `sketch_hll_merge`: Apache DataSketches HLL via hll_sketch_agg /
  hll_union_agg — per-source sketches merged into a global estimate. THE
  100 TB distinct-count pattern: sketches are small, mergeable, and
  precomputable per partition/day; re-aggregation never rescans rows.
  Rows-only gate (sketch estimates are engine-specific by design; the exact
  twin `agg_distinct` is oracle-checked).
- `sketch_freq_items`: freqItems candidate sketch + exact scoring pass.
- `sketch_approx_percentile`: Greenwald-Khanna mergeable quantile sketch.
  Both rows-only for the same reason; each names its exact oracle-checked
  twin in its docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table

TOP_K = 10


@register(
    "topk_heavy_hitters",
    oracle=f"""
    SELECT l_partkey, n_lines
    FROM (
        SELECT l_partkey, COUNT(*) AS n_lines
        FROM lineitem GROUP BY l_partkey
    )
    ORDER BY n_lines DESC, l_partkey ASC
    LIMIT {TOP_K}
    """,
)
def topk_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ClickHouse-topK: most frequent part keys, ties broken by key so
    the result set is a total order (LIMIT without a total order is
    nondeterministic in ANY engine). Spark plans this as partial-agg ->
    shuffle -> final-agg -> TakeOrderedAndProject: the limit is pushed into
    the sort, no full global sort happens."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .orderBy(F.desc("n_lines"), F.asc("l_partkey"))
        .limit(TOP_K)
    )


@register("sketch_hll_merge")  # rows-only: HLL estimates are engine-specific
def sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: one HLL sketch per order-priority
    (the 'per-partition precompute'), then hll_union_agg merges them into a
    global estimate without touching rows again. Exact twin: agg_distinct."""
    o = load_table(spark, sf_dir, "orders")
    per_source = o.groupBy("o_orderpriority").agg(
        F.expr("hll_sketch_agg(o_custkey)").alias("sk"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    per_source.cache()
    per = per_source.select(
        "o_orderpriority",
        F.expr("hll_sketch_estimate(sk)").cast("bigint").alias("approx_customers"),
        "n_orders",
    )
    merged = per_source.agg(
        F.lit("ALL").alias("o_orderpriority"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").cast("bigint").alias(
            "approx_customers"
        ),
        F.sum("n_orders").alias("n_orders"),
    )
    return per.unionAll(merged)


@register("sketch_freq_items")  # rows-only: candidate set is sketch-derived
def sketch_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """freqItems (Karp/Shenker/Papadimitriou one-pass heavy-hitter sketch)
    proposes candidate keys above a support threshold; a second exact pass
    scores them. The sketch pass never shuffles rows (partial summaries
    merge on the driver), the scoring pass is a broadcast semi-join — the
    standard two-pass heavy-hitter shape at 100 TB. Superset guarantee:
    every key above support is in the candidates (plus false positives,
    which the exact pass then ranks out)."""
    li = load_table(spark, sf_dir, "lineitem")
    candidates = li.select("l_suppkey").stat.freqItems(["l_suppkey"], support=0.01)
    cand = candidates.select(
        F.explode("l_suppkey_freqItems").alias("l_suppkey")
    )
    return (
        li.join(F.broadcast(cand), "l_suppkey", "left_semi")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("l_suppkey"))
        .limit(TOP_K)
    )


@register("sketch_approx_percentile")  # rows-only: sketch quantiles differ
def sketch_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna) — the single-pass mergeable
    quantile sketch for 100 TB (exact twin: agg_percentiles /
    stat_median_iqr, both oracle-checked). accuracy=10000 bounds rank error
    at 1/10000 of the partition; sketches merge across partitions without
    a second pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)"
        ).alias("approx_p50_p90_p99"),
        F.expr("approx_percentile(l_quantity, 0.5, 10000)").alias("approx_median_qty"),
    )
