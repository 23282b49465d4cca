"""ClickHouse-dialect frontend as a driver-checked query: the exact query a
reference user would have run against their ClickHouse, executed on Spark
via `frontend/ch_dialect.py`, oracle-checked against hand-written ANSI SQL.

Registered after llm_advanced (last import in queries/__init__.py) so it
queues behind the existing never-driver-checked block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from chainhouse_spark.frontend import ch_sql
from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import register_views

# What a ClickHouse user actually writes: PREWHERE, toStartOfHour, agg
# combinators, toDecimal64 for exact money, uniqExact, a FORMAT tail.
_CH_SQL = """
    SELECT toStartOfHour(ts) AS hour,
           countIf(event_type = 'purchase') AS purchases,
           toFloat64(sumIf(toDecimal64(value, 2), event_type = 'purchase'))
               AS purchase_value,
           uniqExact(user_id) AS users,
           multiIf(countIf(event_type = 'error') > 5, 'noisy',
                   countIf(event_type = 'error') > 0, 'some', 'clean')
               AS error_band
    FROM events
    PREWHERE event_type != 'view'
    GROUP BY hour
    FORMAT TabSeparated
"""


@register(
    "ch_dialect_frontend",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
               AS purchase_value,
           COUNT(DISTINCT user_id) AS users,
           CASE WHEN COUNT(CASE WHEN event_type = 'error' THEN 1 END) > 5
                    THEN 'noisy'
                WHEN COUNT(CASE WHEN event_type = 'error' THEN 1 END) > 0
                    THEN 'some'
                ELSE 'clean' END AS error_band
    FROM events
    WHERE event_type != 'view'
    GROUP BY date_trunc('hour', ts)
    """,
)
def ch_dialect_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A ClickHouse-dialect query (PREWHERE / toStartOfHour / countIf /
    sumIf / toDecimal64 / uniqExact / multiIf / FORMAT tail) translated by
    `translate_ch_sql` and executed by spark.sql — dialect-level parity
    with the reference's actual user-facing SQL surface."""
    register_views(spark, sf_dir)
    return ch_sql(spark, _CH_SQL)


# Round-3 dialect widening exercised end-to-end: JSON extraction from the
# props column, match() regex, 15-minute toStartOfInterval buckets, plural
# quantiles, empty/array handling via extractAll.
_CH_SQL_JSON = """
    SELECT toStartOfInterval(ts, INTERVAL 15 MINUTE) AS bucket,
           countIf(JSONExtractInt(props, 'k') >= 50) AS high_k,
           toFloat64(sumIf(toDecimal64(value, 2),
                           JSONHas(props, 'k'))) AS keyed_value,
           countIf(match(event_type, '^(click|purchase)$')) AS click_or_buy,
           uniqExact(JSONExtractInt(props, 'k')) AS distinct_k
    FROM events
    PREWHERE notEmpty(extractAll(props, '\\\\d+'))
    GROUP BY bucket
    SETTINGS max_threads = 8
"""


@register(
    "ch_dialect_json_buckets",
    oracle="""
    SELECT CAST(to_timestamp(FLOOR(epoch(ts) / 900) * 900) AS TIMESTAMP)
               AS bucket,
           COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                           >= 50 THEN 1 END) AS high_k,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                         THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
               AS keyed_value,
           COUNT(CASE WHEN regexp_matches(event_type, '^(click|purchase)$')
                      THEN 1 END) AS click_or_buy,
           COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS distinct_k
    FROM events
    WHERE len(regexp_extract_all(props, '\\d+')) > 0
    GROUP BY 1
    """,
)
def ch_dialect_json_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-3 dialect additions run end-to-end: JSONExtractInt/JSONHas
    over the props column, match() regex, toStartOfInterval 15-minute
    epoch-floor buckets, extractAll/notEmpty in PREWHERE, and a SETTINGS
    tail — all translated to one Spark SQL statement and hash-checked
    against hand-written ANSI."""
    register_views(spark, sf_dir)
    return ch_sql(spark, _CH_SQL_JSON)


# Round-5 dialect widening: the ClickHouse URL family (domain/path/
# extractURLParameter/cutQueryString), countSubstrings, splitByString and
# arrayFirstIndex — the log-analytics idioms a ClickHouse user writes
# daily — translated and hash-checked against regex-based ANSI.
_CH_SQL_URL = """
    SELECT doc_id,
           domain(url) AS host,
           domainWithoutWWW(url) AS host_nw,
           topLevelDomain(url) AS tld,
           path(url) AS url_path,
           extractURLParameter(url, 'lang') AS lang_param,
           cutQueryString(url) AS base_url,
           countSubstrings(url, '.') AS n_dots,
           arrayFirstIndex(x -> x = 'docs',
                           splitByString('/', path(url))) AS docs_pos
    FROM (SELECT doc_id,
                 concat('https://www.', source, '.example.com/docs/',
                        toString(doc_id), '?lang=', lang, '&n=',
                        toString(n_chars)) AS url
          FROM documents)
    FORMAT JSON
"""


@register(
    "ch_dialect_url_funcs",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               concat('https://www.', source, '.example.com/docs/',
                      CAST(doc_id AS VARCHAR), '?lang=', lang, '&n=',
                      CAST(n_chars AS VARCHAR)) AS url
        FROM documents
    ),
    p AS (
        SELECT doc_id, url,
               regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
               regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS url_path
        FROM u
    )
    SELECT doc_id,
           host,
           regexp_replace(host, '^www\\.', '') AS host_nw,
           regexp_extract(host, '([^.]+)$', 1) AS tld,
           url_path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
           regexp_replace(url, '\\?[^#]*', '') AS base_url,
           CAST(len(url) - len(replace(url, '.', '')) AS BIGINT) AS n_dots,
           CAST(COALESCE(list_position(string_split(url_path, '/'), 'docs'),
                         0) AS BIGINT) AS docs_pos
    FROM p
    """,
)
def ch_dialect_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-5 URL/string/array dialect additions run end-to-end over
    a deterministically synthesized URL column (the web_geo.py generator):
    parse_url-backed domain/path/parameter accessors, regex-cut
    cutQueryString, the countSubstrings length fold, literal-separator
    splitByString (regex-quoted), and arrayFirstIndex — one translated
    statement, hash-checked against hand-written regex ANSI."""
    register_views(spark, sf_dir)
    return ch_sql(spark, _CH_SQL_URL)


_CH_SQL_IP = """
    SELECT intDiv(IPv4StringToNum(ip), 16777216) AS octet1,
           count() AS n_users,
           countIf(isIPv4String(ip)) AS n_valid,
           uniqExact(IPv4NumToString(IPv4StringToNum(ip))) AS n_roundtrip
    FROM (SELECT DISTINCT user_id,
                 concat(toString((user_id * 131 + 7) % 224 + 1), '.',
                        toString((user_id * 31 + 3) % 256), '.',
                        toString((user_id * 17 + 11) % 256), '.',
                        toString((user_id * 7 + 5) % 254 + 1)) AS ip
          FROM events)
    GROUP BY octet1
    SETTINGS max_threads = 4
"""


@register(
    "ch_dialect_ip_rollup",
    oracle="""
    WITH ips AS (
        SELECT DISTINCT user_id,
               concat(CAST((user_id * 131 + 7) % 224 + 1 AS VARCHAR), '.',
                      CAST((user_id * 31 + 3) % 256 AS VARCHAR), '.',
                      CAST((user_id * 17 + 11) % 256 AS VARCHAR), '.',
                      CAST((user_id * 7 + 5) % 254 + 1 AS VARCHAR)) AS ip
        FROM events
    )
    SELECT CAST((user_id * 131 + 7) % 224 + 1 AS BIGINT) AS octet1,
           COUNT(*) AS n_users,
           COUNT(*) AS n_valid,
           COUNT(DISTINCT ip) AS n_roundtrip
    FROM ips
    GROUP BY 1
    """,
)
def ch_dialect_ip_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse IPv4 family end-to-end: IPv4StringToNum (octet fold),
    IPv4NumToString round-trip inside uniqExact, isIPv4String validation
    under countIf, grouped by the first octet via intDiv — the traffic
    rollup shape. The oracle regenerates octet1 from the same LCG the IP
    string was synthesized with, so the fold arithmetic is independently
    proven."""
    register_views(spark, sf_dir)
    return ch_sql(spark, _CH_SQL_IP)


# Round-5 dialect widening #2: QUALIFY — the post-window filter ClickHouse
# (and DuckDB) support natively and Spark lacks. The translation wraps the
# statement in a subquery so window results become filterable columns; the
# oracle runs DuckDB's NATIVE QUALIFY, so the rewrite is checked against a
# real implementation of the clause, not a hand-expansion of it.
_CH_SQL_QUALIFY = """
    SELECT user_id, event_type, ts, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY value DESC, ts, event_type) AS rn,
           toFloat64(sum(toDecimal64(value, 2))
                     OVER (PARTITION BY user_id)) AS user_total
    FROM events
    QUALIFY rn <= 3
    ORDER BY user_id, rn
    SETTINGS max_threads = 4
"""


@register(
    "ch_dialect_qualify",
    oracle="""
    SELECT user_id, event_type, ts, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY value DESC, ts, event_type) AS rn,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id) AS DOUBLE) AS user_total
    FROM events
    QUALIFY rn <= 3
    ORDER BY user_id, rn
    """,
)
def ch_dialect_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY translated to a subquery-hop filter (frontend/ch_dialect.py
    ::_rewrite_qualify) and hash-checked against DuckDB executing the same
    clause natively. Top-3 events per user by value with an exact-decimal
    per-user total: the window sort key (value, ts, event_type) is a total
    order per user up to full-row duplicates, so row_number assignment is
    engine-independent. One window shuffle on user_id, filter applied
    before the final order — the plan Spark's own TopK-per-group takes."""
    register_views(spark, sf_dir)
    return ch_sql(spark, _CH_SQL_QUALIFY)


# Round-10 dialect widening: the three former loud-errors whose semantics
# ARE deterministically expressible (VERDICT r09 task 5) — WITH TOTALS,
# SAMPLE, and parametric topK(k)(x) — exercised together in one statement.
_CH_SQL_TOTALS_SAMPLE = """
    SELECT event_type,
           count() AS n_events,
           uniqExact(user_id) AS users,
           toFloat64(sum(toDecimal64(value, 2))) AS total_value,
           arrayStringConcat(
               arrayMap(u -> toString(u), topK(3)(user_id)), ',') AS top_users
    FROM events SAMPLE 1/4
    GROUP BY event_type WITH TOTALS
    FORMAT Pretty
"""


@register(
    "ch_dialect_totals_sample",
    oracle="""
    WITH s AS (
        SELECT * FROM events
        WHERE ("""
    + " + ".join(
        "(strpos('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), "
        f"{1 + i}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    + """) % 4 < 1
    ),
    agg AS (
        SELECT event_type, COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS users,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM s GROUP BY GROUPING SETS ((event_type), ())
    ),
    cnt AS (
        SELECT event_type, user_id, COUNT(*) AS c FROM s GROUP BY 1, 2
    ),
    per AS (
        SELECT event_type,
               STRING_AGG(CAST(user_id AS VARCHAR), ','
                          ORDER BY c DESC, user_id) AS all_users,
               COUNT(*) AS n_distinct
        FROM cnt GROUP BY event_type
    ),
    tot AS (
        SELECT STRING_AGG(CAST(user_id AS VARCHAR), ','
                          ORDER BY c DESC, user_id) AS all_users
        FROM (SELECT user_id, SUM(c) AS c FROM cnt GROUP BY 1) t
    )
    SELECT agg.event_type, agg.n_events, agg.users, agg.total_value,
           CASE WHEN agg.event_type IS NULL THEN
               array_to_string((string_split(tot.all_users, ','))[1:3], ',')
           ELSE
               array_to_string((string_split(per.all_users, ','))[1:3], ',')
           END AS top_users
    FROM agg
    LEFT JOIN per ON agg.event_type = per.event_type
    CROSS JOIN tot
    """,
)
def ch_dialect_totals_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH TOTALS + SAMPLE + topK(k)(x), all translated (frontend/
    ch_dialect.py): SAMPLE 1/4 becomes the deterministic md5 hash-gate on
    the events sampling key (event_id — SAMPLE_KEYS registry, the analog
    of ClickHouse's DDL-declared sampling key), WITH TOTALS becomes
    GROUPING SETS ((event_type), ()) with the grand-total row carrying a
    NULL key, and topK(3)(user_id) becomes the exact deterministic top-3
    by frequency (count desc, user_id asc tie-break), joined to a string
    for engine-independent comparison. The oracle reconstructs the same
    gate with the strpos hex fold and the same top-3 with an ordered
    STRING_AGG sliced to 3. Plan: one pre-aggregated scan, the grouping
    sets expand to two grouping passes over the SAMPLEd subset only —
    filter sits at the scan, so at 100 TB the gate prunes before any
    shuffle; topK's collect_list buffers one group's user ids (bounded by
    the per-event-type distinct-user count)."""
    register_views(spark, sf_dir)
    return ch_sql(spark, _CH_SQL_TOTALS_SAMPLE)
