"""Statistical aggregates — corr / covariance / linear regression / higher
moments / histograms / conditional-boolean aggregates.

ClickHouse exposes `corr`, `covarSamp`, `simpleLinearRegression`, `skewPop`,
`kurtPop`, `histogram`, `countIf` over the tables the reference provisions
(SURVEY.md §2.6); Spark's built-in twins are `corr`, `covar_samp`,
`regr_slope/regr_intercept`, `skewness`, `kurtosis`, `width_bucket`,
`count_if`. The built-ins accumulate in floating point, so their results
depend on partition merge order and differ across engines — useless for a
bit-exact oracle. Here each statistic is derived from EXACT decimal power
sums (sum x, sum x^2, ... — algebraic, order-insensitive, map-side
combinable) followed by one shared float formula evaluated identically by
Spark and DuckDB. sqrt() is IEEE-correctly-rounded so the formulas avoid
pow() (libm-dependent) in favor of explicit multiplication and SQRT.

Scale: every query is scan -> partial agg -> final agg (single shuffle of a
handful of decimals per group); the float math runs on the final aggregate
rows only. This is also the 100 TB pattern for statistics: never ship rows,
ship moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table

# Exact INTEGER decimal power sums. x = l_quantity (integral in this data),
# y = l_extendedprice rounded to whole dollars. Integer-valued (scale-0)
# decimals are the load-bearing choice: a scale-k decimal -> double cast can
# double-round (engines disagree by 1 ulp once the scaled integer exceeds
# 2^53 — observed on DuckDB vs the JVM), while every sum below stays under
# 2^53 through sf0.1, so each cast is EXACT in both engines and the float
# formulas see bit-identical inputs.
_X = "CAST(ROUND(l_quantity, 0) AS DECIMAL(8,0))"
_Y = "CAST(ROUND(l_extendedprice, 0) AS DECIMAL(10,0))"
_MOMENT_AGGS = f"""
    CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM({_X}) AS DOUBLE) AS sx,
    CAST(SUM({_Y}) AS DOUBLE) AS sy,
    CAST(SUM({_X} * {_X}) AS DOUBLE) AS sxx,
    CAST(SUM({_Y} * {_Y}) AS DOUBLE) AS syy,
    CAST(SUM({_X} * {_Y}) AS DOUBLE) AS sxy
"""

_CORR_FORMULAS = """
    (sxy - sx * sy / n) / (n - 1.0) AS covar_samp,
    (n * sxy - sx * sy)
      / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS corr,
    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
    (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept,
    ((n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)))
      * ((n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)))
      AS r2
"""


@register(
    "stat_corr_regression",
    oracle=f"""
    WITH m AS (
        SELECT l_returnflag, {_MOMENT_AGGS}
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, {_CORR_FORMULAS} FROM m
    """,
)
def stat_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance + OLS fit of
    round(l_extendedprice) ~ l_quantity per return flag, from exact moments.
    (Built-in twins: F.corr / F.covar_samp / REGR_SLOPE / REGR_INTERCEPT.)"""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        *[F.expr(a.strip()) for a in _MOMENT_AGGS.split(",\n")]
    )
    return m.selectExpr("l_returnflag", *_CORR_FORMULAS.split(",\n"))


# Power sums of x = l_quantity up to x^4 — integer decimals throughout
# (50^4 * 600k rows ~ 3.8e12 << 2^53: every cast to double is exact).
_HIGH_MOMENT_AGGS = f"""
    CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM({_X}) AS DOUBLE) AS sx,
    CAST(SUM({_X} * {_X}) AS DOUBLE) AS sxx,
    CAST(SUM(({_X} * {_X}) * {_X}) AS DOUBLE) AS sxxx,
    CAST(SUM(({_X} * {_X}) * ({_X} * {_X})) AS DOUBLE) AS sxxxx
"""

# Population central moments from raw power sums; denominators use
# m2 * SQRT(m2) (resp. m2 * m2) instead of POWER() so both engines hit the
# same IEEE operations.
_HIGH_MOMENT_FORMULAS = """
    (sxx / n - (sx / n) * (sx / n)) AS variance_pop,
    SQRT(sxx / n - (sx / n) * (sx / n)) AS stddev_pop,
    (sxxx / n - 3.0 * (sx / n) * (sxx / n) + 2.0 * (sx / n) * (sx / n) * (sx / n))
      / ((sxx / n - (sx / n) * (sx / n)) * SQRT(sxx / n - (sx / n) * (sx / n)))
      AS skewness_pop,
    (sxxxx / n - 4.0 * (sx / n) * (sxxx / n)
       + 6.0 * (sx / n) * (sx / n) * (sxx / n)
       - 3.0 * (sx / n) * (sx / n) * (sx / n) * (sx / n))
      / ((sxx / n - (sx / n) * (sx / n)) * (sxx / n - (sx / n) * (sx / n)))
      - 3.0 AS kurtosis_excess
"""


@register(
    "stat_moments",
    oracle=f"""
    WITH m AS (
        SELECT l_linestatus, {_HIGH_MOMENT_AGGS}
        FROM lineitem GROUP BY l_linestatus
    )
    SELECT l_linestatus, {_HIGH_MOMENT_FORMULAS} FROM m
    """,
)
def stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population variance / stddev / skewness / excess kurtosis of
    l_quantity per line status from exact power sums (built-in twins:
    var_pop, stddev_pop, skewness, kurtosis)."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy("l_linestatus").agg(
        *[F.expr(a.strip()) for a in _HIGH_MOMENT_AGGS.split(",\n")]
    )
    return m.selectExpr("l_linestatus", *_HIGH_MOMENT_FORMULAS.split(",\n"))


@register(
    "stat_histogram_fixed_bins",
    oracle="""
    SELECT
        CAST(FLOOR(l_extendedprice / 10000.0) AS BIGINT) AS price_bin,
        COUNT(*) AS n_items,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY 1
    """,
)
def stat_histogram_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of l_extendedprice (10k-wide bins). The bin id is
    one IEEE divide + floor — deterministic across engines, unlike
    WIDTH_BUCKET whose edge handling is implementation-defined. Bin id is a
    pure row function: histogram = single shuffle of (bin, partials)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.floor(F.col("l_extendedprice") / 10000.0).cast("bigint").alias("price_bin")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.expr("CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)").alias(
            "total_qty"
        ),
    )


@register(
    "agg_conditional_bool",
    oracle="""
    SELECT
        l_returnflag,
        COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
        COUNT(*) FILTER (WHERE l_tax = 0.0) AS n_taxfree,
        BOOL_AND(l_quantity > 0) AS all_positive_qty,
        BOOL_OR(l_quantity > 49) AS any_qty_49plus
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_conditional_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if / bool_and / bool_or (ClickHouse countIf / groupBitAnd-style
    predicates). count_if aliased to the CASE-sum the oracle uses."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("COUNT_IF(l_discount > 0.05)").alias("n_discounted"),
        F.expr("COUNT_IF(l_tax = 0.0)").alias("n_taxfree"),
        F.expr("BOOL_AND(l_quantity > 0)").alias("all_positive_qty"),
        F.expr("BOOL_OR(l_quantity > 49)").alias("any_qty_49plus"),
    )


@register(
    "stat_median_iqr",
    oracle="""
    SELECT
        l_returnflag,
        MEDIAN(l_quantity) AS median_qty,
        QUANTILE_CONT(l_quantity, 0.25) AS q1_qty,
        QUANTILE_CONT(l_quantity, 0.75) AS q3_qty,
        QUANTILE_CONT(l_quantity, 0.75) - QUANTILE_CONT(l_quantity, 0.25) AS iqr_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def stat_median_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median + interquartile range (both engines define median/quantile_cont
    as the same linear interpolation over the sorted multiset)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("MEDIAN(l_quantity)").alias("median_qty"),
        F.expr("PERCENTILE(l_quantity, 0.25)").alias("q1_qty"),
        F.expr("PERCENTILE(l_quantity, 0.75)").alias("q3_qty"),
        F.expr("PERCENTILE(l_quantity, 0.75) - PERCENTILE(l_quantity, 0.25)").alias(
            "iqr_qty"
        ),
    )


@register(
    "stat_weighted_median",
    oracle="""
    WITH w AS (
        SELECT l_returnflag,
               l_extendedprice AS x,
               CAST(ROUND(l_quantity, 0) AS BIGINT) AS wt
        FROM lineitem
    ),
    cum AS (
        SELECT l_returnflag, x, wt,
               SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY x, wt
                             ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(wt) OVER (PARTITION BY l_returnflag) AS tw
        FROM w
    )
    SELECT l_returnflag, MIN(x) AS weighted_median
    FROM cum WHERE cw * 2 >= tw
    GROUP BY l_returnflag
    """,
)
def stat_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (lower) median: smallest x whose cumulative weight reaches
    half the total — ClickHouse quantileExactWeighted(0.5). Weights are
    integral (quantity), so the threshold test is exact integer arithmetic;
    value ties are broken inside the cumulative ordering and MIN(x) makes
    the pick order-insensitive. One windowed pass per group; at 100 TB the
    same shape runs per (group, day) partition, never a global sort."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("x"),
        F.round("l_quantity", 0).cast("bigint").alias("wt"),
    )
    cum = w.select(
        "l_returnflag",
        "x",
        F.sum("wt")
        .over(
            Window.partitionBy("l_returnflag")
            .orderBy("x", "wt")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("cw"),
        F.sum("wt").over(Window.partitionBy("l_returnflag")).alias("tw"),
    )
    return (
        cum.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(F.min("x").alias("weighted_median"))
    )
