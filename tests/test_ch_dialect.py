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
    # r10: WITH TOTALS and SAMPLE gained deterministic rewrites; the
    # guards that remain are the genuinely config/storage-dependent forms
    # (test_with_totals_guards_raise / test_sample_guards_raise below).
    with pytest.raises(CHTranslationError, match="hash"):
        t("SELECT cityHash64(x) FROM t")


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
        # round-3 additions
        "SELECT match(s, 'a.c'), JSONExtractInt(j, 'k'), bitAnd(a, b) FROM t",
        "SELECT formatDateTime(ts, '%Y-%m'), toStartOfInterval(ts, INTERVAL 5 MINUTE) FROM t",
        "SELECT quantiles(0.5, 0.9)(x), arrayCount(v -> v > 0, a), empty(a) FROM t",
        r"SELECT extractAll(s, '\d+'), replaceRegexpAll(s, 'x', 'y') FROM t",
        # round-4 additions
        "SELECT x FROM t ARRAY JOIN arr AS x WHERE x > 1",
        "SELECT a, b FROM t ORDER BY b LIMIT 3 BY a",
        "SELECT arrayCompact(a), hasAll(a, b), tupleElement(tp, 'k') FROM t",
        "SELECT toMonday(d), toIntervalDay(3), roundBankers(x, 2) FROM t",
    ]
    for s in samples:
        once = t(s)
        assert t(once) == once


def test_limit_by_translates(spark):
    out = t("SELECT a, b FROM t ORDER BY b LIMIT 3 BY a")
    assert "ROW_NUMBER() OVER (PARTITION BY a ORDER BY b)" in out
    assert "__rn <= 3" in out and out.rstrip().endswith("ORDER BY b")
    # trailing LIMIT m survives after the per-group cut
    out = t("SELECT a, b FROM t ORDER BY b DESC LIMIT 2 BY a LIMIT 5")
    assert "__rn <= 2" in out and out.rstrip().endswith("LIMIT 5")
    # executed: first-2-per-group in the stated order
    rows = ch_sql(
        spark,
        "SELECT v % 2 AS g, v FROM (SELECT explode(sequence(1, 9)) AS v) "
        "ORDER BY v LIMIT 2 BY g",
    ).collect()
    assert sorted((r.g, r.v) for r in rows) == [(0, 2), (0, 4), (1, 1), (1, 3)]


def test_limit_by_composes_with_settings_format_tails():
    # ADVICE r04: tails must strip BEFORE the LIMIT BY rewrite, else they
    # leak into the PARTITION BY list / swallow the trailing LIMIT.
    out = t("SELECT a, b FROM t ORDER BY b LIMIT 3 BY a SETTINGS max_threads=4")
    assert "SETTINGS" not in out.upper()
    assert "ROW_NUMBER() OVER (PARTITION BY a ORDER BY b)" in out
    out = t("SELECT a, b FROM t ORDER BY b LIMIT 3 BY a FORMAT JSON")
    assert "FORMAT" not in out.upper()
    assert "PARTITION BY a" in out
    out = t("SELECT a, b FROM t ORDER BY b LIMIT 2 BY a LIMIT 5 SETTINGS max_threads=4")
    assert "__rn <= 2" in out and out.rstrip().endswith("LIMIT 5")


def test_array_join_with_array_literal(spark):
    # ADVICE r04: bare ARRAY must not terminate the expression body when it
    # is an array(...) literal call rather than a nested ARRAY JOIN.
    out = t("SELECT x FROM t ARRAY JOIN array(1,2,3) AS x")
    assert "explode" in out and "array(1,2,3)" in out.replace(" ", "").replace(
        "explode", "explode"
    ) or "array(1, 2, 3)" in out
    rows = ch_sql(
        spark, "SELECT x FROM (SELECT 1 AS id) ARRAY JOIN array(1,2,3) AS x"
    ).collect()
    assert sorted(r.x for r in rows) == [1, 2, 3]


def test_limit_by_guards_raise():
    with pytest.raises(CHTranslationError, match="nondeterministic"):
        t("SELECT a, b FROM t LIMIT 3 BY a")
    with pytest.raises(CHTranslationError, match="offset"):
        t("SELECT a, b FROM t ORDER BY b LIMIT 3, 2 BY a")
    with pytest.raises(CHTranslationError, match="subquery"):
        t("SELECT * FROM (SELECT a, b FROM t ORDER BY b LIMIT 3 BY a) q")


def test_url_functions_translate_and_execute(spark):
    url = "'https://www.shop.example.com/a/b?x=1&y=2#frag'"
    row = ch_sql(
        spark,
        f"SELECT protocol({url}) AS p, domain({url}) AS d, "
        f"domainWithoutWWW({url}) AS dw, topLevelDomain({url}) AS tld, "
        f"path({url}) AS pa, pathFull({url}) AS pf, "
        f"queryString({url}) AS q, fragment({url}) AS f, "
        f"extractURLParameter({url}, 'y') AS y, "
        f"cutQueryString({url}) AS cq, cutFragment({url}) AS cf",
    ).collect()[0]
    assert row.p == "https" and row.d == "www.shop.example.com"
    assert row.dw == "shop.example.com" and row.tld == "com"
    assert row.pa == "/a/b" and row.pf == "/a/b?x=1&y=2"
    assert row.q == "x=1&y=2" and row.f == "frag" and row.y == "2"
    assert row.cq == "https://www.shop.example.com/a/b#frag"
    assert row.cf == "https://www.shop.example.com/a/b?x=1&y=2"


def test_ip_functions_translate_and_execute(spark):
    row = ch_sql(
        spark,
        "SELECT IPv4StringToNum('192.168.1.10') AS n, "
        "IPv4NumToString(3232235786) AS s, "
        "isIPv4String('10.0.0.256') AS bad, "
        "isIPv4String('10.0.0.25') AS good",
    ).collect()[0]
    assert row.n == 3232235786 and row.s == "192.168.1.10"
    assert row.bad is False and row.good is True


def test_string_and_array_additions(spark):
    row = ch_sql(
        spark,
        "SELECT countSubstrings('abcabcab', 'ab') AS c, "
        "splitByString('::', 'a::b::c') AS parts_n, "
        "arrayFirst(x -> x > 2, array(1, 2, 3, 4)) AS first_gt2, "
        "arrayFirstIndex(x -> x > 2, array(1, 2, 3, 4)) AS idx_gt2, "
        "arrayFirstIndex(x -> x > 9, array(1, 2)) AS idx_none, "
        "toStartOfFiveMinutes(timestamp'2024-01-01 10:07:22') AS t5",
    ).collect()[0]
    assert row.c == 3
    assert row.parts_n == ["a", "b", "c"]
    assert row.first_gt2 == 3 and row.idx_gt2 == 3 and row.idx_none == 0
    assert str(row.t5) == "2024-01-01 10:05:00"


def test_splitbystring_requires_literal_separator():
    with pytest.raises(CHTranslationError, match="literal"):
        t("SELECT splitByString(col, s) FROM t")
    # regex metachars in the literal separator must not act as regex
    out = t("SELECT splitByString('.', s) FROM t")
    assert "SPLIT" in out


def test_splitbystring_regex_metachar_literal(spark):
    row = ch_sql(
        spark, "SELECT splitByString('.', '1.2.3') AS p, "
        "splitByString('a+', 'xa+ya+z') AS q"
    ).collect()[0]
    assert row.p == ["1", "2", "3"]
    assert row.q == ["x", "y", "z"]


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


def test_regex_family():
    assert t("SELECT match(s, 'a.c')") == "SELECT (s RLIKE 'a.c')"
    # capture group present -> group 1; absent -> whole match (group 0)
    assert (
        t(r"SELECT extract(s, 'id=(\d+)')")
        == r"SELECT REGEXP_EXTRACT(s, 'id=(\d+)', 1)"
    )
    assert (
        t(r"SELECT extractAll(s, '\d+')")
        == r"SELECT REGEXP_EXTRACT_ALL(s, '\d+', 0)"
    )
    # ANSI EXTRACT(unit FROM ts) must pass through untouched
    assert t("SELECT EXTRACT(YEAR FROM ts)") == "SELECT EXTRACT(YEAR FROM ts)"
    assert (
        t("SELECT replaceRegexpAll(s, 'x+', 'y')")
        == "SELECT REGEXP_REPLACE(s, 'x+', 'y')"
    )
    with pytest.raises(CHTranslationError):
        t("SELECT extract(s, pattern_col)")  # non-literal pattern


def test_json_family():
    assert (
        t("SELECT JSONExtractString(j, 'a', 'b')")
        == "SELECT GET_JSON_OBJECT(j, '$.a.b')"
    )
    assert (
        t("SELECT JSONExtractInt(j, 'n')")
        == "SELECT CAST(GET_JSON_OBJECT(j, '$.n') AS BIGINT)"
    )
    assert (
        t("SELECT JSONHas(j, 'k')")
        == "SELECT (GET_JSON_OBJECT(j, '$.k') IS NOT NULL)"
    )


def test_format_datetime(spark):
    assert (
        t("SELECT formatDateTime(ts, '%Y-%m-%d %H:%M:%S')")
        == "SELECT DATE_FORMAT(ts, 'yyyy-MM-dd HH:mm:ss')"
    )
    # literal letter runs must be quoted for the Java pattern engine
    assert (
        t("SELECT formatDateTime(ts, '%FT%T')")
        == "SELECT DATE_FORMAT(ts, 'yyyy-MM-dd''T''HH:mm:ss')"
    )
    row = ch_sql(
        spark,
        "SELECT formatDateTime(toDateTime('2024-03-05 07:08:09'), "
        "'%Y/%m/%d %H:%M') AS s",
    ).first()
    assert row.s == "2024/03/05 07:08"
    with pytest.raises(CHTranslationError):
        t("SELECT formatDateTime(ts, '%Q%q')")  # %q unsupported
    # %Q is ClickHouse's UNPADDED quarter ('1'), Java 'Q' — not 'QQ' ('01').
    assert t("SELECT formatDateTime(ts, '%Q')") == "SELECT DATE_FORMAT(ts, 'Q')"
    with pytest.raises(CHTranslationError):
        t("SELECT formatDateTime(ts, '%e')")  # space-padded day: no Java field


def test_to_start_of_interval(spark):
    out = t("SELECT toStartOfInterval(ts, INTERVAL 15 MINUTE)")
    assert "FLOOR(UNIX_TIMESTAMP(ts) / 900) * 900" in out
    row = ch_sql(
        spark,
        "SELECT toStartOfInterval(toDateTime('2024-01-01 10:44:59'), "
        "INTERVAL 15 MINUTE) AS b",
    ).first()
    assert str(row.b) == "2024-01-01 10:30:00"
    with pytest.raises(CHTranslationError):
        t("SELECT toStartOfInterval(ts, INTERVAL 1 MONTH)")  # irregular
    with pytest.raises(CHTranslationError):
        # DAY aligns to server-TZ midnight in CH; UTC epoch-floor diverges.
        t("SELECT toStartOfInterval(ts, INTERVAL 1 DAY)")


def test_array_lambda_family(spark):
    assert t("SELECT arrayExists(x -> x > 1, a)") == "SELECT EXISTS(a, x -> x > 1)"
    assert t("SELECT arrayAll(x -> x > 1, a)") == "SELECT FORALL(a, x -> x > 1)"
    assert t("SELECT arrayCount(x -> x > 1, a)") == "SELECT SIZE(FILTER(a, x -> x > 1))"
    assert t("SELECT arrayCount(a)") == "SELECT SIZE(FILTER(a, _x -> _x <> 0))"
    assert t("SELECT countEqual(a, 3)") == "SELECT SIZE(FILTER(a, _x -> _x = 3))"
    assert (
        t("SELECT arrayEnumerate(a)")
        == "SELECT TRANSFORM(a, (_x, _i) -> _i + 1)"
    )
    row = ch_sql(
        spark,
        "SELECT arrayCount(array(0, 1, 2, 0)) AS nz, "
        "countEqual(array(1, 2, 2, 3), 2) AS eq, "
        "arrayPushBack(array(1, 2), 3) AS pb, "
        "range(4) AS r",
    ).first()
    assert row.nz == 2 and row.eq == 2
    assert list(row.pb) == [1, 2, 3] and list(row.r) == [0, 1, 2, 3]
    # Empty-range regression (ClickHouse returns [] for all of these;
    # a bare SEQUENCE translation returned descending arrays instead).
    row = ch_sql(
        spark,
        "SELECT range(0) AS r0, range(5, 3) AS rd, range(3, 3) AS re, "
        "range(2, 5) AS up, arrayEnumerate(array()) AS en, "
        "arrayEnumerate(array(7, 8, 9)) AS e3",
    ).first()
    assert list(row.r0) == [] and list(row.rd) == [] and list(row.re) == []
    assert list(row.up) == [2, 3, 4]
    assert list(row.en) == [] and list(row.e3) == [1, 2, 3]


def test_bitwise_and_quantiles(spark):
    assert t("SELECT bitAnd(a, b)") == "SELECT (a & b)"
    assert t("SELECT bitShiftLeft(a, 2)") == "SELECT (a << 2)"
    assert t("SELECT bitNot(a)") == "SELECT (~(a))"
    assert t("SELECT groupBitXor(f)") == "SELECT BIT_XOR(f)"
    assert (
        t("SELECT quantiles(0.5, 0.9)(x)")
        == "SELECT PERCENTILE_APPROX(x, ARRAY(0.5, 0.9))"
    )
    assert (
        t("SELECT quantilesExact(0.25, 0.75)(x)")
        == "SELECT PERCENTILE(x, ARRAY(0.25, 0.75))"
    )
    row = ch_sql(
        spark,
        "SELECT quantilesExact(0.0, 1.0)(c) AS q FROM "
        "(SELECT explode(array(1, 2, 3, 4)) AS c)",
    ).first()
    assert list(row.q) == [1.0, 4.0]


def test_new_semantic_guards_raise():
    for bad in (
        "SELECT rand()",
        "SELECT rand64()",
        # topK(5)(x) translates since r10 — see
        # test_topk_parametric_translates_and_executes
        "SELECT dictGet('d', 'v', k)",
        "SELECT halfMD5(s)",
        "SELECT farmHash64(s)",
        "SELECT range(1, 10, 2)",
    ):
        with pytest.raises(CHTranslationError):
            t(bad)


def test_misc_new_renames():
    assert t("SELECT lowerUTF8(s), upperUTF8(s)") == "SELECT LOWER(s), UPPER(s)"
    assert t("SELECT replaceAll(s, 'a', 'b')") == "SELECT REPLACE(s, 'a', 'b')"
    assert t("SELECT countDistinct(u)") == "SELECT COUNT(DISTINCT u)"
    assert t("SELECT materialize(x)") == "SELECT (x)"
    assert t("SELECT empty(a), notEmpty(a)") == "SELECT (SIZE(a) = 0), (SIZE(a) <> 0)"
    assert t("SELECT arraySlice(a, 2, 3)") == "SELECT SLICE(a, 2, 3)"
    assert t("SELECT arrayElement(a, 2)") == "SELECT ELEMENT_AT(a, 2)"


def test_behavioral_parametrics_raise_with_pointers():
    for bad, hint in (
        ("SELECT windowFunnel(3600)(ts, a, b) FROM t", "funnel_steps"),
        ("SELECT sequenceMatch('(?1).*(?2)')(ts, a, b) FROM t", "sequence_match_regex"),
        ("SELECT sequenceCount('(?1)(?2)')(ts, a, b) FROM t", "sequence_pairs"),
        ("SELECT retention(c1, c2, c3) FROM t", "retention_weekly"),
        ("SELECT groupArrayMovingAvg(10)(x) FROM t", "ROWS BETWEEN"),
    ):
        with pytest.raises(CHTranslationError, match=hint):
            t(bad)


def test_final_stripped_with_fill_raises():
    # FINAL is ReplacingMergeTree read-time dedup; this engine dedups
    # exactly at write time, so FINAL is a no-op and strips.
    assert (
        t("SELECT count() FROM blocks FINAL WHERE number > 5")
        == "SELECT COUNT(*) FROM blocks WHERE number > 5"
    )
    assert t("SELECT a FROM db.t FINAL") == "SELECT a FROM db.t"
    # FINAL as a column name is untouched
    assert t("SELECT final FROM t") == "SELECT final FROM t"
    with pytest.raises(CHTranslationError, match="spine"):
        t("SELECT d FROM t ORDER BY d WITH FILL")


def test_datetime64_date32_arrayzip():
    assert t("SELECT toDateTime64(x, 3)") == "SELECT CAST(x AS TIMESTAMP)"
    assert t("SELECT toDate32(x)") == "SELECT CAST(x AS DATE)"
    assert t("SELECT arrayZip(a, b)") == "SELECT ARRAYS_ZIP(a, b)"


def test_array_join_clause(spark):
    # aliased single-array form translates to LATERAL VIEW EXPLODE
    out = t("SELECT x FROM t ARRAY JOIN arr AS x WHERE x > 1")
    assert "LATERAL VIEW EXPLODE(arr) _aj_x AS x" in out
    assert "WHERE x > 1" in out
    out = t("SELECT x FROM t LEFT ARRAY JOIN arr AS x")
    assert "LATERAL VIEW OUTER EXPLODE(arr) _aj_x AS x" in out
    # executes: element rows, and LEFT keeps the empty-array row as NULL
    rows = ch_sql(
        spark,
        "SELECT id, x FROM (SELECT 1 AS id, array(10, 20) AS arr "
        "UNION ALL SELECT 2, array()) "
        "LEFT ARRAY JOIN arr AS x ORDER BY id, x",
    ).collect()
    assert [(r.id, r.x) for r in rows] == [(1, 10), (1, 20), (2, None)]
    inner = ch_sql(
        spark,
        "SELECT id, x FROM (SELECT 1 AS id, array(10, 20) AS arr "
        "UNION ALL SELECT 2, array()) "
        "ARRAY JOIN arr AS x ORDER BY id, x",
    ).collect()
    assert [(r.id, r.x) for r in inner] == [(1, 10), (1, 20)]
    # function-expression array with ORDER BY termination
    out = t("SELECT v FROM t ARRAY JOIN splitByChar(',', s) AS v ORDER BY v")
    assert "LATERAL VIEW EXPLODE(SPLIT(s, ',')) _aj_v AS v" in out
    assert out.rstrip().endswith("ORDER BY v")


def test_array_join_unsupported_forms_raise(spark):
    with pytest.raises(CHTranslationError, match="rebinds"):
        t("SELECT arr FROM t ARRAY JOIN arr")
    with pytest.raises(CHTranslationError, match="lockstep"):
        t("SELECT a, b FROM t ARRAY JOIN xs AS a, ys AS b")


def test_round4_function_batch(spark):
    # date parts / trunc
    assert t("SELECT toMonday(d)") == "SELECT DATE_TRUNC('WEEK', d)"
    assert t("SELECT toQuarter(d)") == "SELECT QUARTER(d)"
    assert t("SELECT toDayOfYear(d)") == "SELECT DAYOFYEAR(d)"
    assert t("SELECT toStartOfWeek(d, 1)") == "SELECT DATE_TRUNC('WEEK', d)"
    with pytest.raises(CHTranslationError, match="Sunday"):
        t("SELECT toStartOfWeek(d)")
    # arrays / maps
    assert t("SELECT arrayMin(a), arrayMax(a)") == "SELECT ARRAY_MIN(a), ARRAY_MAX(a)"
    assert t("SELECT hasAny(a, b)") == "SELECT ARRAYS_OVERLAP(a, b)"
    assert t("SELECT hasAll(a, b)") == "SELECT (SIZE(ARRAY_EXCEPT(b, a)) = 0)"
    assert (
        t("SELECT arrayIntersect(a, b, c)")
        == "SELECT ARRAY_INTERSECT(ARRAY_INTERSECT(a, b), c)"
    )
    assert t("SELECT mapKeys(m), mapContains(m, 'k')") == (
        "SELECT MAP_KEYS(m), MAP_CONTAINS_KEY(m, 'k')"
    )
    with pytest.raises(CHTranslationError, match="running-sum"):
        t("SELECT arrayCumSum(a)")
    # strings / misc renames
    assert t("SELECT concatWithSeparator('-', a, b)") == "SELECT CONCAT_WS('-', a, b)"
    assert t("SELECT positionCaseInsensitive(s, 'A')") == (
        "SELECT INSTR(LOWER(s), LOWER('A'))"
    )
    assert t("SELECT roundBankers(x, 2)") == "SELECT BROUND(x, 2)"
    assert t("SELECT base64Decode(s)") == "SELECT CAST(UNBASE64(s) AS STRING)"
    # tuples
    assert t("SELECT tuple(a, b)") == "SELECT STRUCT(a, b)"
    assert t("SELECT tupleElement(tp, 'a')") == "SELECT (tp).a"
    with pytest.raises(CHTranslationError, match="POSITION"):
        t("SELECT tupleElement(tp, 1)")
    # intervals
    assert t("SELECT ts + toIntervalDay(3)") == "SELECT ts + MAKE_DT_INTERVAL(3)"
    assert t("SELECT toIntervalMonth(2)") == "SELECT MAKE_YM_INTERVAL(0, 2)"
    # null/finite helpers
    assert t("SELECT assumeNotNull(x)") == "SELECT (x)"
    # executed semantics: compact/difference/avg/finite/tuple/interval
    row = ch_sql(
        spark,
        "SELECT arrayCompact(array(1, 1, 2, 2, 1)) AS ac, "
        "arrayDifference(array(1, 2, 5)) AS ad, "
        "arrayAvg(array(1, 2, 3, 4)) AS aa, "
        "ifNotFinite(DOUBLE('Infinity'), 42.0) AS fin, "
        "ifNotFinite(2.5, 9.9) AS fin2, "
        "hasAll(array(1, 2, 3), array(2, 3)) AS hall, "
        "hasAll(array(1), array(2)) AS hnot, "
        "tupleElement(tuple(7, 8), 'col1') AS te, "
        "intDivOrZero(7, 0) AS dz, moduloOrZero(7, 0) AS mz, "
        "toMonday(toDate('2024-01-04')) AS mon, "
        "CAST(toDateTime('2024-01-01 00:00:00') + toIntervalDay(3) AS STRING) AS plus3",
    ).first()
    assert list(row.ac) == [1, 2, 1]
    assert list(row.ad) == [0, 1, 3]
    assert row.aa == 2.5
    assert row.fin == 42.0 and row.fin2 == 2.5
    assert row.hall is True and row.hnot is False
    assert row.te == 7
    assert row.dz == 0 and row.mz == 0
    assert str(row.mon)[:10] == "2024-01-01"
    assert row.plus3.startswith("2024-01-04")


def test_if_combinator_generalized(spark):
    assert t("SELECT uniqIf(u, a = 1)") == (
        "SELECT APPROX_COUNT_DISTINCT(IF(a = 1, u, NULL))"
    )
    assert t("SELECT uniqExactIf(u, a = 1)") == (
        "SELECT COUNT(DISTINCT IF(a = 1, u, NULL))"
    )
    assert t("SELECT groupArrayIf(x, x > 0)") == (
        "SELECT COLLECT_LIST(IF(x > 0, x, NULL))"
    )
    assert t("SELECT stddevPopIf(x, x > 0)") == (
        "SELECT STDDEV_POP(IF(x > 0, x, NULL))"
    )
    row = ch_sql(
        spark,
        "SELECT uniqExactIf(v, v % 2 = 0) AS evens "
        "FROM (SELECT explode(sequence(1, 10)) AS v)",
    ).first()
    assert row.evens == 5
    with pytest.raises(CHTranslationError, match="State/-Merge"):
        t("SELECT uniqState(u) FROM t")
    with pytest.raises(CHTranslationError, match="State/-Merge"):
        t("SELECT sumMerge(s) FROM t")


def test_qualify_translates(spark):
    out = t(
        "SELECT a, row_number() OVER (PARTITION BY a ORDER BY b) AS rn "
        "FROM t QUALIFY rn <= 2"
    )
    assert "QUALIFY" not in out.upper()
    assert out.startswith("SELECT * FROM (") and "WHERE rn <= 2" in out
    # trailing ORDER BY / LIMIT stay outside the subquery hop
    out = t(
        "SELECT a, row_number() OVER (ORDER BY b) AS rn FROM t "
        "QUALIFY rn <= 2 ORDER BY a LIMIT 5"
    )
    assert out.rstrip().endswith("WHERE rn <= 2 ORDER BY a LIMIT 5")
    # executed: top-1 per group, window alias filterable
    rows = ch_sql(
        spark,
        "SELECT v % 2 AS g, v, row_number() OVER "
        "(PARTITION BY v % 2 ORDER BY v DESC) AS rn "
        "FROM (SELECT explode(sequence(1, 9)) AS v) QUALIFY rn = 1",
    ).collect()
    assert sorted((r.g, r.v) for r in rows) == [(0, 8), (1, 9)]


def test_qualify_composes_with_tails_and_limit_by(spark):
    # SETTINGS/FORMAT tails strip before the rewrite
    out = t(
        "SELECT a, row_number() OVER (ORDER BY b) AS rn FROM t "
        "QUALIFY rn <= 2 SETTINGS max_threads = 4"
    )
    assert "SETTINGS" not in out.upper() and "WHERE rn <= 2" in out
    # QUALIFY then LIMIT BY: both rewrites compose on one statement
    out = t(
        "SELECT a, b, row_number() OVER (ORDER BY b) AS rn FROM t "
        "QUALIFY rn <= 10 ORDER BY b LIMIT 2 BY a"
    )
    assert "WHERE rn <= 10" in out and "__rn <= 2" in out


def test_qualify_guards_raise():
    with pytest.raises(CHTranslationError, match="alias the window"):
        t("SELECT a FROM t QUALIFY row_number() OVER (ORDER BY b) <= 2")
    with pytest.raises(CHTranslationError, match="subquery"):
        t(
            "SELECT * FROM (SELECT a, row_number() OVER (ORDER BY b) AS rn "
            "FROM t QUALIFY rn <= 2) q"
        )
    with pytest.raises(CHTranslationError, match="empty predicate"):
        t("SELECT a, 1 AS rn FROM t QUALIFY ORDER BY a")


def test_uniq_up_to_and_bitmap_translate_and_execute(spark):
    out = t("SELECT uniqUpTo(3)(x) AS u FROM t")
    assert "LEAST(COUNT(DISTINCT x), (3) + 1)" in out
    assert "COUNT(DISTINCT user_id)" in t("SELECT groupBitmap(user_id) FROM t")
    assert "PERCENTILE_APPROX(x, 0.5)" in t("SELECT quantileTDigest(0.5)(x) FROM t")
    assert "PERCENTILE_APPROX(x, ARRAY(0.5, 0.9))" in t(
        "SELECT quantilesTiming(0.5, 0.9)(x) FROM t"
    )
    # executed: saturation at N + 1 when the true cardinality exceeds N
    row = ch_sql(
        spark,
        "SELECT uniqUpTo(3)(v) AS capped, uniqUpTo(20)(v) AS exact_u, "
        "groupBitmap(v) AS gb "
        "FROM (SELECT explode(sequence(1, 9)) AS v)",
    ).collect()[0]
    assert (row.capped, row.exact_u, row.gb) == (4, 9, 9)


def test_sketch_and_weighted_topk_fail_loudly():
    # These would otherwise pass through untranslated and die later in
    # Spark analysis with an unrelated-looking error.
    import pytest

    from chainhouse_spark.frontend.ch_dialect import (
        CHTranslationError,
        translate_ch_sql,
    )

    for q in (
        "SELECT uniqCombined64(x) FROM t",
        "SELECT uniqTheta(x) FROM t",
        "SELECT topKWeighted(5)(x, w) FROM t",
    ):
        with pytest.raises(CHTranslationError):
            translate_ch_sql(q)


def test_with_totals_rewrites_to_grouping_sets():
    out = t("SELECT a, count() AS n FROM t GROUP BY a WITH TOTALS")
    assert "GROUPING SETS((a), ())" in out.replace("SETS ((", "SETS((")
    assert "TOTALS" not in out.upper()
    # multi-key list survives intact
    out2 = t("SELECT a, b, count() FROM t GROUP BY a, b WITH TOTALS ORDER BY a")
    assert "((a, b), ())" in out2
    assert out2.rstrip().endswith("ORDER BY a")


def test_with_totals_guards_raise():
    with pytest.raises(CHTranslationError, match="totals_mode"):
        t("SELECT a, count() FROM t GROUP BY a WITH TOTALS HAVING count() > 2")
    with pytest.raises(CHTranslationError, match="redundant"):
        t("SELECT a, count() FROM t GROUP BY ROLLUP(a) WITH TOTALS")
    with pytest.raises(CHTranslationError, match="subquery"):
        t("SELECT * FROM (SELECT a, count() FROM t GROUP BY a WITH TOTALS) x")
    with pytest.raises(CHTranslationError, match="without a GROUP BY"):
        t("SELECT count() FROM t WITH TOTALS")


def test_sample_rewrites_to_hash_gate():
    out = t("SELECT event_type FROM events SAMPLE 1/4")
    assert "MD5(CAST(event_id AS STRING))" in out
    assert ", 4) < 1" in out
    # decimal form reduces: 0.25 == 1/4; alias preserved
    out2 = t("SELECT e.event_type FROM events AS e SAMPLE 0.25")
    assert ", 4) < 1" in out2 and ") e" in out2
    # FINAL strips first, then SAMPLE sees the bare table ref
    out3 = t("SELECT l_orderkey FROM lineitem FINAL SAMPLE 1/5")
    assert "MD5(CAST(l_orderkey AS STRING))" in out3 and ", 5) < 1" in out3


def test_sample_guards_raise():
    with pytest.raises(CHTranslationError, match="rowcount"):
        t("SELECT a FROM events SAMPLE 1000")
    with pytest.raises(CHTranslationError, match="OFFSET"):
        t("SELECT a FROM events SAMPLE 1/4 OFFSET 1/2")
    with pytest.raises(CHTranslationError, match="no sampling key"):
        t("SELECT a FROM mystery SAMPLE 0.5")
    with pytest.raises(CHTranslationError, match="strictly in"):
        t("SELECT a FROM events SAMPLE 5/4")
    with pytest.raises(CHTranslationError, match="plain table reference"):
        t("SELECT a FROM (SELECT 1 AS a) q SAMPLE 0.5")


def test_topk_parametric_translates_and_executes(spark):
    out = t("SELECT topK(3)(x) FROM t")
    assert "COLLECT_LIST(x)" in out and "ARRAY_SORT" in out and ", 1, 3)" in out
    with pytest.raises(CHTranslationError, match="integer literal"):
        t("SELECT topK(k)(x) FROM t")
    with pytest.raises(CHTranslationError, match="parametric form"):
        t("SELECT topK(x) FROM t")
    # executed: exact frequency order with value-ascending tie-break.
    # 3×'b', 2×'a', 2×'c', 1×'d' -> top3 = b, then the a/c tie by value.
    row = ch_sql(
        spark,
        "SELECT topK(3)(v) AS top3 FROM (SELECT explode(array("
        "'b','b','b','a','a','c','c','d')) AS v)",
    ).collect()[0]
    assert row.top3 == ["b", "a", "c"]


def test_sample_totals_topk_compose(spark):
    # The registered driver query's shape end-to-end on a tiny frame.
    df = ch_sql(
        spark,
        "SELECT v, count() AS n, topK(2)(u) AS top_u "
        "FROM (SELECT explode(array(1, 2, 3, 4, 5, 6, 7, 8)) AS u, 'x' AS v) "
        "GROUP BY v WITH TOTALS",
    )
    rows = {r.v: r for r in df.collect()}
    assert set(rows) == {"x", None}
    assert rows["x"].n == 8 and rows[None].n == 8
    assert rows["x"].top_u == [1, 2]


def test_sample_inside_string_literal_untouched():
    # ADVICE r10: the SAMPLE rewrite used raw .search over the SQL, so a
    # quoted literal containing "FROM events SAMPLE 1/4" had the hash-gate
    # subquery spliced INSIDE the string, silently changing its value.
    # All three scan points (OFFSET guard, rewrite loop, residual guard)
    # must be string-aware.
    sql = "SELECT a FROM t WHERE s = 'FROM events SAMPLE 1/4'"
    assert t(sql) == sql
    # double-quoted and mixed with a REAL sample on the outer query:
    out = t("SELECT event_type FROM events SAMPLE 1/4 "
            "WHERE note = 'events SAMPLE 9/10 OFFSET 1/2'")
    assert "'events SAMPLE 9/10 OFFSET 1/2'" in out  # literal intact
    assert "MD5(CAST(event_id AS STRING))" in out    # real SAMPLE rewritten
    # literal-only OFFSET text must not trip the OFFSET guard either
    sql3 = "SELECT a FROM t WHERE s = 'SAMPLE 1/4 OFFSET 1/2'"
    assert t(sql3) == sql3


def test_topk_zero_rejected():
    # ADVICE r10: \d+ accepted k=0 (always-empty SLICE) despite the error
    # text promising a positive integer.
    with pytest.raises(CHTranslationError, match="positive integer"):
        t("SELECT topK(0)(x) FROM t")
    with pytest.raises(CHTranslationError, match="positive integer"):
        t("SELECT topK(00)(x) FROM t")
