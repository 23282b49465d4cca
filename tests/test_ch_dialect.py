"""ClickHouse-dialect frontend: translation goldens, semantic guards, and
executed equivalence against plain Spark SQL."""

from __future__ import annotations

import pytest

from chainhouse_spark.frontend import CHTranslationError, ch_sql, translate_ch_sql

SF = "/root/testdata/sf0.01"


def t(s: str) -> str:
    return translate_ch_sql(s)


def test_cast_family():
    assert t("SELECT toInt64(x)") == "SELECT CAST(x AS BIGINT)"
    assert t("SELECT toUInt64(x)") == "SELECT CAST(x AS DECIMAL(20, 0))"
    assert t("SELECT toFloat64(x)") == "SELECT CAST(x AS DOUBLE)"
    assert t("SELECT toDecimal64(v, 2)") == "SELECT CAST(v AS DECIMAL(18, 2))"
    assert t("SELECT toString(x)") == "SELECT CAST(x AS STRING)"


def test_time_family():
    assert t("SELECT toStartOfHour(ts)") == "SELECT DATE_TRUNC('HOUR', ts)"
    assert t("SELECT toYYYYMM(d)") == "SELECT CAST(DATE_FORMAT(d, 'yyyyMM') AS INT)"
    assert t("SELECT toHour(ts), toYear(ts)") == "SELECT HOUR(ts), YEAR(ts)"


def test_if_combinators_and_parametric():
    assert t("SELECT countIf(a = 1)") == "SELECT COUNT(IF(a = 1, 1, NULL))"
    assert t("SELECT sumIf(v, a = 1)") == "SELECT SUM(IF(a = 1, v, NULL))"
    assert (
        t("SELECT quantile(0.5)(x)") == "SELECT PERCENTILE_APPROX(x, 0.5)"
    )
    assert t("SELECT quantileExact(0.9)(x)") == "SELECT PERCENTILE(x, 0.9)"
    assert t("SELECT uniqExact(u)") == "SELECT COUNT(DISTINCT u)"
    assert t("SELECT uniq(u)") == "SELECT APPROX_COUNT_DISTINCT(u)"


def test_multiif_and_arrays():
    assert (
        t("SELECT multiIf(a, 1, b, 2, 0)")
        == "SELECT CASE WHEN a THEN 1 WHEN b THEN 2 ELSE 0 END"
    )
    assert t("SELECT arrayJoin(xs)") == "SELECT EXPLODE(xs)"
    assert t("SELECT has(xs, 1)") == "SELECT ARRAY_CONTAINS(xs, 1)"
    assert (
        t("SELECT arrayMap(x -> x + 1, xs)") == "SELECT TRANSFORM(xs, x -> x + 1)"
    )
    assert t("SELECT arrayFilter(x -> x > 0, xs)") == "SELECT FILTER(xs, x -> x > 0)"
    assert t("SELECT splitByChar(',', s)") == "SELECT SPLIT(s, ',')"


def test_nested_translation():
    assert (
        t("SELECT sumIf(toDecimal64(v, 2), toYear(ts) = 2024)")
        == "SELECT SUM(IF(YEAR(ts) = 2024, CAST(v AS DECIMAL(18, 2)), NULL))"
    )


def test_statement_level():
    assert (
        t("SELECT a FROM t PREWHERE a > 1 FORMAT TabSeparated")
        == "SELECT a FROM t WHERE a > 1"
    )
    assert t("SELECT 1 SETTINGS max_threads = 4") == "SELECT 1"


def test_strings_and_identifiers_untouched():
    assert (
        t("SELECT 'toInt64(x)' AS s, `toHour` FROM t")
        == "SELECT 'toInt64(x)' AS s, `toHour` FROM t"
    )


def test_semantic_guards_raise():
    with pytest.raises(CHTranslationError, match="TOTALS"):
        t("SELECT a, count() FROM t GROUP BY a WITH TOTALS")
    with pytest.raises(CHTranslationError, match="hash"):
        t("SELECT cityHash64(x) FROM t")
    with pytest.raises(CHTranslationError, match="SAMPLE"):
        t("SELECT * FROM t SAMPLE 0.1")


def test_executed_equivalence_on_events(spark):
    """A realistic ClickHouse-flavored query must execute on Spark and
    match the hand-written Spark SQL twin, row for row."""
    from chainhouse_spark.tables import register_views

    register_views(spark, SF)
    ch = """
        SELECT toStartOfHour(ts) AS hour,
               countIf(event_type = 'purchase') AS purchases,
               toFloat64(sumIf(toDecimal64(value, 2), event_type = 'purchase'))
                   AS purchase_value,
               uniqExact(user_id) AS users
        FROM events
        PREWHERE event_type != 'error'
        GROUP BY hour
        ORDER BY hour
        FORMAT TabSeparated
    """
    twin = """
        SELECT DATE_TRUNC('HOUR', ts) AS hour,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
                   AS purchase_value,
               COUNT(DISTINCT user_id) AS users
        FROM events
        WHERE event_type != 'error'
        GROUP BY hour
        ORDER BY hour
    """
    got = ch_sql(spark, ch).collect()
    want = spark.sql(twin).collect()
    assert got == want
    assert len(got) > 0


def test_parameterless_count():
    assert t("SELECT count() FROM t") == "SELECT COUNT(*) FROM t"
    assert t("SELECT count(x) FROM t") == "SELECT count(x) FROM t"


def test_argmax_arrays_arith():
    assert t("SELECT argMax(u, v)") == "SELECT MAX_BY(u, v)"
    assert t("SELECT arrayUniq(xs)") == "SELECT SIZE(ARRAY_DISTINCT(xs))"
    assert t("SELECT intDiv(a, b)") == "SELECT (a DIV b)"
    assert t("SELECT plus(a, multiply(b, 2))") == "SELECT (a + (b * 2))"
    assert t("SELECT arraySort(xs)") == "SELECT ARRAY_SORT(xs)"
    with pytest.raises(CHTranslationError, match="comparator"):
        t("SELECT arraySort(x -> -x, xs)")


def test_join_modifiers():
    assert (
        t("SELECT * FROM a GLOBAL JOIN b ON a.k = b.k")
        == "SELECT * FROM a JOIN b ON a.k = b.k"
    )
    assert (
        t("SELECT * FROM a GLOBAL LEFT JOIN b ON a.k = b.k")
        == "SELECT * FROM a LEFT JOIN b ON a.k = b.k"
    )
    with pytest.raises(CHTranslationError, match="ASOF"):
        t("SELECT * FROM a ASOF JOIN b ON a.k = b.k AND a.t >= b.t")
    with pytest.raises(CHTranslationError, match="ANY JOIN"):
        t("SELECT * FROM a LEFT ANY JOIN b ON a.k = b.k")


def test_translation_is_idempotent():
    """Translated output is valid input: a second pass changes nothing."""
    samples = [
        "SELECT toStartOfHour(ts), countIf(a = 1), quantile(0.5)(x) FROM t PREWHERE b",
        "SELECT sumIf(toDecimal64(v, 2), toYear(ts) = 2024) FROM t",
        "SELECT argMax(u, v), intDiv(a, b), arrayUniq(xs) FROM t",
    ]
    for s in samples:
        once = t(s)
        assert t(once) == once


def test_limit_by_raises_with_recipe():
    with pytest.raises(CHTranslationError, match="ROW_NUMBER"):
        t("SELECT a, b FROM t ORDER BY b LIMIT 3 BY a")


def test_timestamp_and_weekday_conventions(spark):
    assert t("SELECT toUnixTimestamp(ts)") == "SELECT UNIX_TIMESTAMP(ts)"
    assert t("SELECT fromUnixTimestamp(x)") == "SELECT TIMESTAMP_SECONDS(x)"
    assert t("SELECT toDayOfWeek(d)") == "SELECT (WEEKDAY(d) + 1)"
    # executed: ISO numbering — 2024-01-01 is a Monday -> 1
    row = ch_sql(
        spark, "SELECT toDayOfWeek(toDate('2024-01-01')) AS dw"
    ).first()
    assert row.dw == 1
    assert t("SELECT arrayStringConcat(xs, ',')") == "SELECT ARRAY_JOIN(xs, ',')"


def test_date_arithmetic(spark):
    assert (
        t("SELECT dateDiff('day', a, b)") == "SELECT TIMESTAMPDIFF(DAY, a, b)"
    )
    assert t("SELECT addDays(ts, 3)") == "SELECT TIMESTAMPADD(DAY, 3, ts)"
    assert (
        t("SELECT subtractHours(ts, 2)") == "SELECT TIMESTAMPADD(HOUR, -(2), ts)"
    )
    # executed: timestamps stay timestamps (date_add would degrade to DATE)
    row = ch_sql(
        spark,
        "SELECT addDays(toDateTime('2024-01-01 10:30:00'), 2) AS x, "
        "dateDiff('hour', toDateTime('2024-01-01 00:00:00'), "
        "toDateTime('2024-01-02 06:00:00')) AS h",
    ).first()
    assert str(row.x) == "2024-01-03 10:30:00"
    assert row.h == 30
