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
- `sketch_freq_items`: freqItems candidate sketch + exact scoring pass.
- `sketch_approx_percentile`: Greenwald-Khanna mergeable quantile sketch.

Sketch estimates are engine-specific by design, so the sketch queries are
oracled via the invariant-twin pattern: every exact quantity in the output
(counts, distincts, top-k) is cross-checked against DuckDB, and each sketch
estimate is reduced to a boolean accuracy assertion that the oracle states
as TRUE — if the sketch drifts outside its error bound, the bool flips and
the value-hash mismatches. Raw estimates stay available through the
operator functions and unit tests.
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


@register(
    "sketch_hll_merge",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           COUNT(*) AS n_orders,
           TRUE AS approx_ok
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT 'ALL' AS o_orderpriority,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           COUNT(*) AS n_orders,
           TRUE AS approx_ok
    FROM orders
    """,
)
def sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: one HLL sketch per order-priority
    (the 'per-partition precompute'), then hll_union_agg merges them into a
    global estimate without touching rows again — re-aggregation never
    rescans rows. Sketch estimates are engine-specific, so the oracled
    surface is the invariant: exact distincts (cross-checked, including the
    merged ALL row) + a bool asserting each estimate is within 10 % of
    exact (DataSketches HLL at default lgK errs ~1.6 %, so a pass is a real
    accuracy statement)."""
    o = load_table(spark, sf_dir, "orders")
    per_source = o.groupBy("o_orderpriority").agg(
        F.expr("hll_sketch_agg(o_custkey)").alias("sk"),
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )
    per_source.cache()
    per = per_source.select(
        "o_orderpriority",
        F.expr("hll_sketch_estimate(sk)").cast("bigint").alias("approx_customers"),
        "n_orders",
        "exact_customers",
    )
    merged = (
        per_source.agg(
            F.lit("ALL").alias("o_orderpriority"),
            F.expr("hll_sketch_estimate(hll_union_agg(sk))")
            .cast("bigint")
            .alias("approx_customers"),
            F.sum("n_orders").alias("n_orders"),
        )
        # Merged exact distinct is not derivable from per-group exacts
        # (customers span priorities) — one extra tiny global distinct.
        .crossJoin(o.agg(F.countDistinct("o_custkey").alias("exact_customers")))
    )
    both = per.unionAll(merged.select(*per.columns))
    return both.select(
        "o_orderpriority",
        "exact_customers",
        "n_orders",
        (
            F.abs(F.col("approx_customers") - F.col("exact_customers"))
            <= F.lit(0.10) * F.col("exact_customers").cast("double")
        ).alias("approx_ok"),
    )


@register(
    "sketch_freq_items",
    oracle=f"""
    SELECT l_suppkey, exact_count FROM (
        SELECT l_suppkey, COUNT(*) AS exact_count
        FROM lineitem GROUP BY l_suppkey
    )
    ORDER BY exact_count DESC, l_suppkey ASC
    LIMIT {TOP_K}
    """,
)
def sketch_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """freqItems (Karp/Shenker/Papadimitriou one-pass heavy-hitter sketch)
    proposes candidate keys above a support threshold; a second exact pass
    scores them. The sketch pass never shuffles rows (partial summaries
    merge on the driver), the scoring pass is a broadcast semi-join — the
    standard two-pass heavy-hitter shape at 100 TB. Superset guarantee:
    every key above support is in the candidates (plus false positives,
    which the exact pass then ranks out). The oracle is the exact global
    top-K: it matches exactly when the candidate superset covers the true
    top-K, which the support guarantee ensures whenever each top-K key
    exceeds 1 % frequency (true for the testdata supplier distribution;
    pinned by the parity replay in tests/test_oracle_parity.py)."""
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


@register(
    "sketch_approx_percentile",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_rows,
           TRUE AS ok_p50, TRUE AS ok_p90, TRUE AS ok_p99, TRUE AS ok_median_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sketch_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna) — the single-pass mergeable
    quantile sketch for 100 TB (exact twin: agg_percentiles /
    stat_median_iqr, both oracle-checked). accuracy=10000 bounds rank error
    at 1/10000 of the partition; sketches merge across partitions without a
    second pass. Sketch quantiles are engine-specific, so the oracled
    surface is the invariant: group count (cross-checked) + one bool per
    quantile asserting the sketch value lies within the exact [p-0.01,
    p+0.01] percentile band — a rank-error statement ~100x looser than the
    sketch's guarantee, so a failure means the sketch is broken, not noisy."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)"
        ).alias("ap"),
        F.expr("approx_percentile(l_quantity, 0.5, 10000)").alias("amq"),
        F.expr(
            "percentile(l_extendedprice, array(0.49, 0.51, 0.89, 0.91, 0.98, 1.0))"
        ).alias("pb"),
        F.expr("percentile(l_quantity, array(0.49, 0.51))").alias("qb"),
    )

    def _in_band(value, lo, hi):
        return (value >= lo) & (value <= hi)

    return agg.select(
        "l_returnflag",
        "n_rows",
        _in_band(
            F.element_at("ap", 1), F.element_at("pb", 1), F.element_at("pb", 2)
        ).alias("ok_p50"),
        _in_band(
            F.element_at("ap", 2), F.element_at("pb", 3), F.element_at("pb", 4)
        ).alias("ok_p90"),
        _in_band(
            F.element_at("ap", 3), F.element_at("pb", 5), F.element_at("pb", 6)
        ).alias("ok_p99"),
        _in_band(
            F.col("amq"), F.element_at("qb", 1), F.element_at("qb", 2)
        ).alias("ok_median_qty"),
    )
