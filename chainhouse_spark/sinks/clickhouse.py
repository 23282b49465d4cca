"""ClickHouse sink: DDL derived from the StructTypes (K1/K2) and a JDBC
write path (K5/K6), import-gated since no JDBC driver ships in this
environment.

The DDL reproduces the reference's provisioning (src/main.rs:52-161) —
same engines, same ORDER BY keys, same column spellings — but derived from
the single-source-of-truth schemas instead of a second hand-written copy,
and honoring the endpoint argument the reference ignores (it hardcodes
127.0.0.1:9000 at src/main.rs:46 despite accepting --clickhouse at :20-21).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DecimalType,
    LongType,
    StringType,
    StructType,
)

from chainhouse_spark.schemas import DEDUP_KEYS, TABLES

# Reference DDL uses FixedString for known-width binary columns
# (src/main.rs:66-83 etc.); widths are not expressible in a StructType, so
# they are declared once here.
FIXED_WIDTHS: dict[str, int] = {
    "hash": 32, "parentHash": 32, "sha3Uncles": 32, "mixHash": 32,
    "stateRoot": 32, "transactionsRoot": 32, "receiptsRoot": 32,
    "withdrawlsRoot": 32, "blockHash": 32, "transactionHash": 32,
    "r": 32, "s": 32,
    # topics elements are FixedString(32) in the reference DDL
    # (src/main.rs:137); uncles stays Array(String) there (src/main.rs:69).
    "topics": 32,
    "miner": 20, "from": 20, "to": 20, "address": 20, "contractAddress": 20,
    "nonce": 8,  # block nonce; tx nonce is Decimal so never hits this map
}

# Columns the reference stores as plain String despite being bytes
# (logsBloom, extraData, input, data — src/main.rs:82,84,107,138).
_NON_NULLABLE_SENTINEL = object()


def _ch_type(name: str, dtype: DataType) -> str:
    if isinstance(dtype, BinaryType):
        if name in FIXED_WIDTHS and name != "nonce":
            return f"FixedString({FIXED_WIDTHS[name]})"
        if name == "nonce":
            return "FixedString(8)"
        return "String"
    if isinstance(dtype, DecimalType):
        return "UInt256"
    if isinstance(dtype, LongType):
        return "UInt64"
    if isinstance(dtype, BooleanType):
        return "Boolean"
    if isinstance(dtype, StringType):
        return "String"
    if isinstance(dtype, ArrayType):
        return f"Array({_ch_type(name, dtype.elementType)})"
    raise ValueError(f"no ClickHouse mapping for {name}: {dtype}")


def table_ddl(
    name: str,
    schema: StructType | None = None,
    database: str = "ethereum",
    order_by: list[str] | None = None,
    engine: str = "ReplacingMergeTree",
) -> str:
    """CREATE TABLE IF NOT EXISTS DDL string for a table (default: one of
    the four ethereum tables with its reference ORDER BY key)."""
    schema = schema if schema is not None else TABLES[name]
    order_by = order_by if order_by is not None else DEDUP_KEYS[name]
    cols = []
    for f in schema.fields:
        t = _ch_type(f.name, f.dataType)
        # ClickHouse can't wrap Array in Nullable; key columns stay non-null.
        nullable = f.nullable and f.name not in order_by and not t.startswith("Array")
        cols.append(f"    `{f.name}` {'Nullable(' + t + ')' if nullable else t}")
    cols_sql = ",\n".join(cols)
    key = ", ".join(f"`{k}`" for k in order_by)
    return (
        f"CREATE TABLE IF NOT EXISTS {database}.{name}\n(\n{cols_sql}\n)\n"
        f"ENGINE = {engine}\nORDER BY ({key})"
    )


def database_ddl(database: str = "ethereum") -> str:
    return f"CREATE DATABASE IF NOT EXISTS {database}"


def all_ddl(database: str = "ethereum") -> list[str]:
    """The reference's five provisioning statements (src/main.rs:53-161)."""
    return [database_ddl(database)] + [table_ddl(n, database=database) for n in TABLES]


def jdbc_projection(df: DataFrame) -> DataFrame:
    """JDBC-portable view of a chain table: the JDBC wire (and Spark's JDBC
    writer) has no Array type and most targets cap DECIMAL below 38 digits,
    so arrays serialize as JSON strings (binary elements -> base64, Spark's
    to_json encoding) and u256 decimals as digit strings. ClickHouse coerces
    digit strings into the UInt256 columns the DDL provisions; array columns
    land in String staging and are materialized server-side
    (JSONExtract(...)). Binary/long/bool/string columns pass through — the
    round-trip test pins value fidelity for every column class."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, ArrayType):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        elif isinstance(f.dataType, DecimalType) and f.dataType.precision > 31:
            cols.append(F.col(f.name).cast("string").alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def write_jdbc(
    df: DataFrame,
    name: str,
    endpoint: str,
    database: str = "ethereum",
    batch_size: int = 100_000,
    url: str | None = None,
    driver: str | None = "com.clickhouse.jdbc.ClickHouseDriver",
) -> None:
    """JDBC bulk insert (the K6 native-format insert's Spark equivalent,
    src/main.rs:292-319): each partition opens one connection and writes
    `batch_size`-row prepared-statement batches — K4's flush batching,
    executor-side and table-parallel like the reference's try_join!.

    Defaults target ClickHouse; `url`/`driver` are pluggable so the write
    path itself is executable against any JDBC database (the round-trip
    test in tests/test_sources_sinks.py drives it with Spark's bundled
    embedded Derby — no ClickHouse server ships in this environment).
    Raises a clear error when the target driver is absent."""
    url = url or f"jdbc:clickhouse://{endpoint}/{database}"
    try:
        w = (
            jdbc_projection(df)
            .write.format("jdbc")
            .option("url", url)
            .option("dbtable", name if url.startswith("jdbc:derby") else f"{database}.{name}")
            .option("batchsize", str(batch_size))
            .mode("append")
        )
        if driver:
            w = w.option("driver", driver)
        w.save()
    except Exception as e:  # driver missing in this container
        if "ClassNotFoundException" in str(e) or "No suitable driver" in str(e):
            raise RuntimeError(
                "JDBC driver unavailable for "
                f"{url!r}; provision it on the cluster classpath "
                "(com.clickhouse:clickhouse-jdbc for the default target)"
            ) from e
        raise
