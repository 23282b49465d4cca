"""Schema-enforced file sources for landing zones (JSONL / CSV).

The reference ingests only via RPC (src/main.rs:172-174); real deployments
also land raw exports as files. Two rules make file ingest scale-safe:

1. ALWAYS pass an explicit schema. `inferSchema` scans the data once just to
   guess types (2× read at 100 TB) and the guess drifts as data evolves —
   the schema is a contract, not a suggestion.
2. Capture bad records instead of failing the job or silently nulling rows:
   PERMISSIVE mode + `_corrupt_record` keeps malformed lines as data, so the
   pipeline quarantines them (filter on the column) and loads the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return schema.add(CORRUPT_COL, StringType(), True)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType, mode: str = "PERMISSIVE"
) -> DataFrame:
    """JSON-lines reader: one object per line, explicit schema, malformed
    lines captured whole in `_corrupt_record` (NULL for clean rows)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """CSV reader with the same contract: explicit schema, corrupt capture."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", str(header).lower())
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, quarantined_raw_lines).

    Spark refuses queries that reference ONLY `_corrupt_record` on a raw
    file source (the column exists only during parsing), so the split
    materializes the parsed frame first — one parse feeding both branches,
    which is also the efficient shape: quarantining should never re-read
    the landing zone. Lazy localCheckpoint, not .cache(): the branches
    read materialized rows (no raw-source reference left in their plans),
    and no CacheManager entry outlives the caller (round-13).
    """
    df = df.localCheckpoint(eager=False)
    clean = df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = df.filter(df[CORRUPT_COL].isNotNull()).select(CORRUPT_COL)
    return clean, bad
