"""Bucketed at-rest layout: co-located joins without a shuffle.

At 100 TB the lineitem⨝orders edge is the expensive shuffle (SCALE.md); if
both tables are written bucketed (and sorted) by the join key with the same
bucket count, Spark's bucketed scan aligns partitions 1:1 and the sort-merge
join runs with ZERO Exchange — the Spark equivalent of the co-located
MergeTree layout the reference leans on ClickHouse for (SURVEY.md §2.4 K9).

Bucket-count guidance: pick so each bucket's largest table slice fits an
executor's memory budget (e.g. 100 TB lineitem / 4096 buckets ≈ 25 GB —
pair with spark.sql.files.maxPartitionBytes for the scan side). Bucket
pruning applies to equality predicates on the bucket column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Save `df` as a bucketed (and bucket-sorted) catalog table at `path`."""
    w = df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key — planned
    as a shuffle-free sort-merge join when bucket specs align."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
