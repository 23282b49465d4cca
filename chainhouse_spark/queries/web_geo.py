"""Web-log and geospatial analytics — ClickHouse URL/IP/geo function parity.

The reference delegates its entire query surface to ClickHouse
(`/root/reference/src/main.rs:56-161` provisions the tables; all analytics are
whatever ClickHouse SQL offers).  ClickHouse ships first-class URL functions
(`domain`, `topLevelDomain`, `path`, `extractURLParameter`), IPv4 codecs
(`IPv4StringToNum` / `IPv4NumToString`), and geo primitives
(`greatCircleDistance`, `geohashEncode`).  These queries re-express each
family as declarative Spark over the synthetic tables, with exact DuckDB
oracles.

Determinism notes (registry.py rules):
  - URL/IP queries are pure string/integer transforms — exact on any engine.
  - The geo join compares a haversine distance against a threshold; both
    engines evaluate the IDENTICAL arithmetic expression over IEEE doubles
    (<=1 ulp libm divergence), and the output distance is rounded to 3 dp.

Scale notes:
  - URL/IP queries are map-only projections followed by one hash aggregate —
    no joins, shuffle only on the (small) group key.
  - The geo near-pair join is the band-blocking pattern: a 200 km threshold
    bounds |Δlat| <= 1.8°, so 2°-latitude bands with ±1 neighbor expansion
    give a COMPLETE candidate set from an equi-join on the band id — the
    shape that survives 100 TB (no cross join; candidate count is
    sum-of-band-sizes², not n²).  The quadratic form exists only in the
    DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table

# --------------------------------------------------------------------------
# URL functions (ClickHouse domain/path/extractURLParameter analogues)
# --------------------------------------------------------------------------

_URL_EXPR = (
    "concat('https://www.', source, '.example.com/docs/', CAST(doc_id AS STRING),"
    " '?lang=', lang, '&n=', CAST(n_chars AS STRING))"
)
_URL_EXPR_DUCK = (
    "concat('https://www.', source, '.example.com/docs/', CAST(doc_id AS VARCHAR),"
    " '?lang=', lang, '&n=', CAST(n_chars AS VARCHAR))"
)


@register(
    "scalar_url_funcs",
    oracle=f"""
    WITH u AS (SELECT doc_id, {_URL_EXPR_DUCK} AS url FROM documents)
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)      AS host,
           regexp_extract(url, '\\.([a-z]+)/', 1)             AS tld,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1)          AS lang_param
    FROM u
    """,
)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse URL family via Spark's built-in ``parse_url`` (JVM-side,
    whole-stage-codegen): domain -> HOST, path -> PATH, extractURLParameter
    -> QUERY with key.  The URL column is derived deterministically from the
    documents table; the oracle re-parses it with regexes."""
    d = load_table(spark, sf_dir, "documents")
    url = F.expr(_URL_EXPR)
    host = F.parse_url(url, F.lit("HOST"))
    return d.select(
        "doc_id",
        host.alias("host"),
        F.element_at(F.split(host, r"\."), -1).alias("tld"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


# --------------------------------------------------------------------------
# IPv4 functions (ClickHouse IPv4StringToNum / IPv4NumToString analogues)
# --------------------------------------------------------------------------

# Deterministic synthetic IPv4 per user: four LCG-ish octets off user_id.
_OCTETS = (
    "((user_id * 131 + 7) % 224 + 1)",   # 1..224 — valid first octet
    "((user_id * 31 + 3) % 256)",
    "((user_id * 17 + 11) % 256)",
    "((user_id * 7 + 5) % 254 + 1)",     # 1..254 — no .0 / .255 hosts
)
_IP_STR = (
    f"concat(CAST({_OCTETS[0]} AS STRING), '.', CAST({_OCTETS[1]} AS STRING),"
    f" '.', CAST({_OCTETS[2]} AS STRING), '.', CAST({_OCTETS[3]} AS STRING))"
)
_IP_STR_DUCK = _IP_STR.replace("AS STRING", "AS VARCHAR")


@register(
    "scalar_ip_funcs",
    oracle=f"""
    WITH ips AS (SELECT DISTINCT user_id, {_IP_STR_DUCK} AS ip FROM events),
    parsed AS (
        SELECT user_id, ip,
               CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
             + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
             + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
             + CAST(string_split(ip, '.')[4] AS BIGINT) AS ip_num,
               concat(string_split(ip, '.')[1], '.', string_split(ip, '.')[2],
                      '.', string_split(ip, '.')[3], '.0/24') AS subnet
        FROM ips
    )
    SELECT subnet, COUNT(DISTINCT user_id) AS n_users,
           MIN(ip_num) AS min_ip_num, MAX(ip_num) AS max_ip_num
    FROM parsed GROUP BY subnet
    """,
)
def scalar_ip_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4StringToNum / subnet aggregation: parse a dotted-quad string back
    to its u32, group users by /24.  Pure integer/string ops — exact."""
    e = load_table(spark, sf_dir, "events")
    ips = e.select("user_id", F.expr(_IP_STR).alias("ip")).distinct()
    oct_ = F.split(F.col("ip"), r"\.")
    parsed = ips.select(
        "user_id",
        (
            oct_.getItem(0).cast("bigint") * 16777216
            + oct_.getItem(1).cast("bigint") * 65536
            + oct_.getItem(2).cast("bigint") * 256
            + oct_.getItem(3).cast("bigint")
        ).alias("ip_num"),
        F.concat_ws(
            ".", oct_.getItem(0), oct_.getItem(1), oct_.getItem(2), F.lit("0/24")
        ).alias("subnet"),
    )
    return parsed.groupBy("subnet").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.min("ip_num").alias("min_ip_num"),
        F.max("ip_num").alias("max_ip_num"),
    )


# --------------------------------------------------------------------------
# Geo near-pair join (greatCircleDistance + band blocking)
# --------------------------------------------------------------------------

# Deterministic synthetic coordinates per customer (integer LCG, exact on
# both engines; /100.0 is a single exact-halving-free float op done last).
_LAT = "(((c_custkey * 9301 + 49297) % 18000) / 100.0 - 90.0)"
_LON = "(((c_custkey * 7919 + 104729) % 36000) / 100.0 - 180.0)"

_GEO_THRESHOLD_KM = 200.0
# 200 km / 111.19 km-per-deg = 1.80° max |Δlat| -> 2° bands, ±1 neighbor.
_BAND_DEG = 2.0

_HAV = (
    "2.0 * 6371.0 * asin(sqrt("
    "pow(sin(radians({lat2} - {lat1}) / 2.0), 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * pow(sin(radians({lon2} - {lon1}) / 2.0), 2)))"
)


@register(
    "geo_grid_near_pairs",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS k, {_LAT} AS lat, {_LON} AS lon FROM customer
    )
    SELECT a.k AS k1, b.k AS k2,
           ROUND({_HAV.format(lat1='a.lat', lat2='b.lat', lon1='a.lon', lon2='b.lon')}, 3)
             AS dist_km
    FROM pts a JOIN pts b ON a.k < b.k
    WHERE {_HAV.format(lat1='a.lat', lat2='b.lat', lon1='a.lon', lon2='b.lon')}
          <= {_GEO_THRESHOLD_KM}
    """,
)
def geo_grid_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within 200 km (haversine), found WITHOUT a cross
    join: block on 2° latitude bands (a 200 km threshold bounds |Δlat| to
    1.8°, so a band ±1 expansion is a complete candidate set), equi-join on
    the band id, then the exact distance filter.  The oracle is the honest
    quadratic form — feasible only at test scale."""
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("k"),
        F.expr(_LAT).alias("lat"),
        F.expr(_LON).alias("lon"),
    )
    band = F.floor(F.col("lat") / _BAND_DEG)
    left = pts.withColumn(
        "band",
        F.explode(F.array(band - 1, band, band + 1)),
    )
    right = pts.withColumn("band", band)
    a, b = left.alias("a"), right.alias("b")
    dist = F.expr(
        _HAV.format(lat1="a.lat", lat2="b.lat", lon1="a.lon", lon2="b.lon")
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band")) & (F.col("a.k") < F.col("b.k")),
        )
        .filter(dist <= _GEO_THRESHOLD_KM)
        .select(
            F.col("a.k").alias("k1"),
            F.col("b.k").alias("k2"),
            F.round(dist, 3).alias("dist_km"),
        )
    )
