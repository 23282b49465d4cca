"""Scalar function library coverage — SURVEY.md §2.6 "Scalar function
library". String, date/time, math, conditional, JSON-path and array
functions, each expressed with built-in `pyspark.sql.functions` (JVM-side,
whole-stage-codegen'd — never Python UDFs) and an equivalent DuckDB oracle.

Cross-engine determinism notes: transcendental functions (ln/exp/pow) are
avoided — libm last-bit differences between JVM and C would break value
hashes; sqrt is IEEE-exact so it is safe. Day-of-week uses ISO numbering
(Spark weekday()+1 == DuckDB isodow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.functions.rounding import round9
from chainhouse_spark.queries.registry import exempt_round9, register
from chainhouse_spark.tables import load_table


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT
        c_custkey,
        UPPER(c_name) AS name_upper,
        LOWER(c_mktsegment) AS seg_lower,
        LENGTH(c_name) AS name_len,
        SUBSTR(c_name, 1, 8) AS name_prefix,
        c_name || '/' || c_mktsegment AS name_seg,
        REPLACE(c_name, 'Customer', 'Cust') AS name_short,
        LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
        TRIM('  ' || c_mktsegment || ' ') AS seg_trimmed,
        (c_name LIKE '%001%') AS has_001,
        CONTAINS(c_mktsegment, 'MACH') AS is_mach,
        STARTS_WITH(c_mktsegment, 'BUIL') AS is_build
    FROM customer
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("name_seg"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("seg_trimmed"),
        F.col("c_name").like("%001%").alias("has_001"),
        F.contains(F.col("c_mktsegment"), F.lit("MACH")).alias("is_mach"),
        F.startswith(F.col("c_mktsegment"), F.lit("BUIL")).alias("is_build"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT
        o_orderkey,
        EXTRACT(YEAR FROM o_orderdate) AS order_year,
        EXTRACT(MONTH FROM o_orderdate) AS order_month,
        EXTRACT(DAY FROM o_orderdate) AS order_day,
        CAST(ISODOW(o_orderdate) AS INT) AS iso_weekday,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month_start,
        o_orderdate + INTERVAL 30 DAY AS due_date,
        CAST(CAST(LAST_DAY(o_orderdate) AS DATE) AS TIMESTAMP) AS month_end,
        EXTRACT(QUARTER FROM o_orderdate) AS order_quarter
    FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        (F.weekday("o_orderdate") + 1).cast("int").alias("iso_weekday"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.last_day("o_orderdate").cast("timestamp_ntz").alias("month_end"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT
        l_orderkey,
        l_linenumber,
        (ROUND((ABS(l_discount - 0.05)) * 1e9) / 1e9 + 0.0) AS disc_dev,
        CAST(FLOOR(l_quantity / 7) AS BIGINT) AS qty_bucket,
        CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_k,
        (ROUND((SQRT(l_quantity)) * 1e9) / 1e9 + 0.0) AS qty_sqrt,
        l_orderkey % 97 AS key_mod,
        CAST(l_quantity AS BIGINT) // 10 AS qty_div10,
        ROUND(CAST(l_extendedprice AS DECIMAL(12,2)), 1) AS price_r1,
        CAST(SIGN(l_discount - 0.05) AS INT) AS disc_sign
    FROM lineitem
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math on IEEE-exact operations only (see module docstring). ROUND on
    a DECIMAL (price_r1) is half-up in both engines; (ROUND((double) * 1e9) / 1e9 + 0.0) on
    the two bounded float outputs is cross-engine-exact below ~1e3 (the
    round-at-9 convention, registry.ROUND9_EXEMPT docs)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        round9(F.abs(F.col("l_discount") - 0.05)).alias("disc_dev"),
        F.floor(F.col("l_quantity") / 7).alias("qty_bucket"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k"),
        round9(F.sqrt("l_quantity")).alias("qty_sqrt"),
        (F.col("l_orderkey") % 97).alias("key_mod"),
        F.expr("CAST(l_quantity AS BIGINT) div 10").alias("qty_div10"),
        F.round(F.col("l_extendedprice").cast("decimal(12,2)"), 1).alias("price_r1"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


@register(
    "scalar_conditional",
    oracle="""
    SELECT
        o_orderkey,
        CASE
            WHEN o_totalprice >= 300000 THEN 'jumbo'
            WHEN o_totalprice >= 150000 THEN 'large'
            WHEN o_totalprice >= 50000 THEN 'medium'
            ELSE 'small'
        END AS size_class,
        COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_desc,
        GREATEST(o_totalprice, 100000.0) AS floor_price,
        LEAST(o_totalprice, 400000.0) AS cap_price,
        (o_orderstatus = 'F' AND o_totalprice > 200000) AS big_closed
    FROM orders
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "jumbo")
        .when(F.col("o_totalprice") >= 150000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_desc"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("floor_price"),
        F.least(F.col("o_totalprice"), F.lit(400000.0)).alias("cap_price"),
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000)).alias(
            "big_closed"
        ),
    )


@register(
    "scalar_json",
    oracle="""
    SELECT
        event_id,
        json_extract_string(props, '$.k') AS k_str,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
        CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        (CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS k_high
    FROM events
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction on the event props payload (P6's query-side twin)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("long").alias("k_int"),
        (k.cast("long") % 10).alias("k_bucket"),
        (k.cast("long") > 50).alias("k_high"),
    )


@register(
    "scalar_array_funcs",
    oracle="""
    SELECT
        doc_id,
        len(string_split(text, ' ')) AS n_tokens,
        len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
        list_contains(string_split(text, ' '), 'spark') AS has_spark,
        list_sort(list_distinct(string_split(text, ' ')))[1] AS first_token,
        array_to_string(list_sort(list_distinct(string_split(substr(text, 1, 40), ' '))), '|') AS head_tokens
    FROM documents
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array primitives over tokenized text — the building blocks the LLM
    dedup/text operators reuse."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_sort(F.array_distinct(toks))[0].alias("first_token"),
        F.array_join(
            F.array_sort(F.array_distinct(F.split(F.substring(F.col("text"), 1, 40), " "))),
            "|",
        ).alias("head_tokens"),
    )


@register(
    "udtf_token_counts",
    oracle="""
    SELECT doc_id, tok AS token, CAST(COUNT(*) AS INT) AS n
    FROM (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id < 50
    ) t
    GROUP BY doc_id, tok
    """,
)
def udtf_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join, oracle-checked against the declarative
    equivalent (unnest + count) — proves the table-function surface."""
    from chainhouse_spark.functions.python_surface import TokenCounts

    spark.udtf.register("token_counts", TokenCounts)
    load_table(spark, sf_dir, "documents").filter("doc_id < 50").createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        "SELECT doc_id, t.token, t.n FROM _udtf_docs, LATERAL token_counts(text) t"
    )


@register(
    "udaf_gmean_by_type",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events, TRUE AS gmean_ok
    FROM events
    GROUP BY event_type
    """,
)
def udaf_gmean_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (Python UDAF): geometric mean of event values
    per type. The raw float is engine-specific (log-sum order), so the
    oracled surface is the invariant: group count (cross-checked) + a bool
    asserting the UDAF agrees with the JVM-side exp(avg(ln)) reference to
    1e-9 relative. Exactness vs a local pandas recompute is additionally
    pinned in tests/test_python_surface.py."""
    from chainhouse_spark.functions.python_surface import gmean_value

    e = load_table(spark, sf_dir, "events")
    # A grouped-agg pandas UDF cannot share an Aggregate with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — two aggs joined on the tiny group key.
    udaf = e.groupBy("event_type").agg(gmean_value("value").alias("gmean_value"))
    ref = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.exp(F.avg(F.log(F.col("value").cast("double")))).alias("ref_gmean"),
    )
    g = udaf.join(ref, "event_type")
    return g.select(
        "event_type",
        "n_events",
        (
            F.abs(F.col("gmean_value") - F.col("ref_gmean"))
            <= F.lit(1e-9) * F.abs(F.col("ref_gmean"))
        ).alias("gmean_ok"),
    )


@register(
    "scalar_map_funcs",
    oracle="""
    SELECT event_id,
           map_from_entries([struct_pack(k := 'type', v := event_type),
                             struct_pack(k := 'src', v := 'events')])['type'][1] AS type_val,
           len(map_keys(map_from_entries([struct_pack(k := 'type', v := event_type),
                                          struct_pack(k := 'src', v := 'events')]))) AS n_keys,
           CAST(map_from_entries([struct_pack(k := 'n', v := value)])['n'][1] AS DOUBLE) AS n_val
    FROM events
    WHERE event_id < 500
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction and lookup — returns scalar lookups (never raw
    map cells: map ordering is engine-specific and would break hashing)."""
    e = load_table(spark, sf_dir, "events").filter("event_id < 500")
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("src")),
        F.array(F.col("event_type"), F.lit("events")),
    )
    mv = F.map_from_arrays(F.array(F.lit("n")), F.array(F.col("value")))
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("type_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(mv, "n").cast("double").alias("n_val"),
    )


@register(
    "scalar_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS band,
           o_orderkey | 4096 AS bor,
           xor(o_orderkey, 170) AS bxor,
           o_orderkey << 2 AS shl,
           o_orderkey >> 3 AS shr,
           bit_count(o_orderkey) AS popcnt
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface (mask/shift/popcount) — the hex-adjacent
    integer ops a chain-data user reaches for (topic masks, bloom bits)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").alias("band"),
        F.expr("o_orderkey | 4096").alias("bor"),
        F.expr("o_orderkey ^ 170").alias("bxor"),
        F.expr("shiftleft(o_orderkey, 2)").alias("shl"),
        F.expr("shiftright(o_orderkey, 3)").alias("shr"),
        F.expr("bit_count(o_orderkey)").alias("popcnt"),
    )


@register(
    "scalar_higher_order",
    oracle="""
    SELECT o_orderkey,
           array_to_string(list_transform(range(1, CAST(o_orderkey % 5 + 4 AS BIGINT)), x -> x * x), ',') AS squares,
           array_to_string(list_filter(range(1, CAST(o_orderkey % 5 + 4 AS BIGINT)), x -> x % 2 = 0), ',') AS evens,
           CAST(list_reduce(list_transform(range(1, CAST(o_orderkey % 5 + 4 AS BIGINT)), x -> x * x),
                            (acc, x) -> acc + x) AS BIGINT) AS sq_sum
    FROM orders
    WHERE o_orderkey < 300
    """,
)
def scalar_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform / filter / aggregate) — all
    JVM lambda expressions inside codegen, the Spark-native replacement for
    row-level Python loops. Array outputs are serialized with array_join:
    the driver canonicalizer pandas-sorts columns and cannot hash lists
    (CORRECTNESS_r04 scalar_higher_order err)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    seq = "sequence(1, o_orderkey % 5 + 3)"
    return o.select(
        "o_orderkey",
        F.expr(f"array_join(transform({seq}, x -> x * x), ',')").alias("squares"),
        F.expr(f"array_join(filter({seq}, x -> x % 2 = 0), ',')").alias("evens"),
        F.expr(
            f"CAST(aggregate(transform({seq}, x -> x * x), 0L, (acc, x) -> acc + x) AS BIGINT)"
        ).alias("sq_sum"),
    )


@register(
    "scalar_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract(props, '$.missing') AS BIGINT) AS missing_val,
           CAST(json_extract('{"a": {"b": [10, 20, 30]}}', '$.a.b[1]') AS BIGINT) AS nested_val
    FROM events
    WHERE event_id < 200
    """,
)
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: parse once,
    extract typed values by path (missing paths -> NULL). VARIANT keeps a
    binary-encoded tree — repeated path access avoids re-parsing the JSON
    text, the scale answer for wide semi-structured columns; the oracle's
    json_extract is the text-path equivalent."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return e.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k_val"),
        F.expr("variant_get(parse_json(props), '$.missing', 'bigint')").alias(
            "missing_val"
        ),
        F.expr(
            "variant_get(parse_json('{\"a\": {\"b\": [10, 20, 30]}}'), '$.a.b[1]', 'bigint')"
        ).alias("nested_val"),
    )


@register(
    "scalar_regex",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]{6,})', 1) AS first_long_word,
           regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled_head,
           regexp_matches(text, 'the|and') AS has_common,
           len(regexp_extract_all(text, '[a-z]{6,}')) AS n_long_words
    FROM (SELECT doc_id, substr(text, 1, 80) AS text FROM documents) t
    """,
)
def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface: extract / global replace / match test / extract-all.
    Patterns stay in the RE2-compatible subset both engines agree on."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 80).alias("text")
    )
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]{6,})", 1).alias("first_long_word"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled_head"),
        F.expr("text RLIKE 'the|and'").alias("has_common"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]{6,}', 0)")).alias("n_long_words"),
    )


@register(
    "scalar_null_semantics",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_filled,
           (NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL) AS is_open,
           (o_orderstatus IS NOT DISTINCT FROM NULLIF(o_orderstatus, 'O')) AS nullsafe_self
    FROM orders
    WHERE o_orderkey < 400
    """,
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic surface: NULLIF / COALESCE / null-safe equality
    (IS NOT DISTINCT FROM == Spark's <=>) — the semantics dedup keys and
    join keys silently depend on."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    return o.select(
        "o_orderkey",
        F.expr("NULLIF(o_orderstatus, 'O')").alias("status_or_null"),
        F.expr("COALESCE(NULLIF(o_orderstatus, 'O'), 'open')").alias("status_filled"),
        F.expr("NULLIF(o_orderstatus, 'O') <=> NULL").alias("is_open"),
        F.expr("o_orderstatus <=> NULLIF(o_orderstatus, 'O')").alias("nullsafe_self"),
    )


@register(
    "scalar_try_safety",
    oracle="""
    SELECT o_orderkey,
           o_totalprice / NULLIF(o_orderkey % 7, 0) AS safe_div,
           TRY_CAST(o_orderpriority AS BIGINT) AS bad_cast,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS good_cast
    FROM orders
    WHERE o_orderkey < 400
    """,
)
def scalar_try_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic: try_divide / try_cast return NULL instead of
    failing the 1000-executor job 6 hours in because one row divides by
    zero — the oracle states the same contract as NULLIF guards."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    return o.select(
        "o_orderkey",
        F.expr("try_divide(o_totalprice, o_orderkey % 7)").alias("safe_div"),
        F.expr("try_cast(o_orderpriority AS BIGINT)").alias("bad_cast"),
        F.expr("try_cast(substr(o_orderpriority, 1, 1) AS BIGINT)").alias("good_cast"),
    )


# Round-at-9 exemption (registry.ROUND9_EXEMPT): price/modulo ratio ~5e5,
# past the cross-engine ROUND agreement zone — protected by the shared
# single-division formula (try_divide == x / NULLIF(y, 0)).
exempt_round9("scalar_try_safety", {
    "safe_div": "price-scale ratio (~5e5 at sf0.01)",
})
