"""Z-order layout test: prove the clustering claim with parquet FOOTER STATS,
not vibes — under Z-order, row-group min/max rectangles must be tight on
BOTH columns, where a single-column sort is tight on one and useless on the
other."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _avg_rowgroup_span(path: str, col: str, total_span: int) -> float:
    """Mean (max-min)/total_span over row groups and files — 1.0 means every
    row group covers the whole value range (no skipping possible)."""
    import glob

    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    spans.append(
                        (c.statistics.max - c.statistics.min) / total_span
                    )
    assert spans, f"no stats found for {col}"
    return sum(spans) / len(spans)


def test_zorder_tightens_both_columns(spark, tmp_path):
    from chainhouse_spark.sinks.zorder import zorder_by

    n = 1 << 14
    # two independent uniform columns — worst case for a single sort key
    df = spark.range(n).select(
        F.col("id").alias("seq"),
        F.expr("CAST(conv(substr(md5(CAST(id AS STRING)), 1, 8), 16, 10) % 16384 AS BIGINT)").alias("a"),
        F.expr("CAST(conv(substr(md5(CAST(id + 99999 AS STRING)), 1, 8), 16, 10) % 16384 AS BIGINT)").alias("b"),
    )
    span = n  # both columns range over ~[0, 16384)

    rg_conf = {"parquet.block.size": str(16 * 1024)}  # force many row groups

    single = str(tmp_path / "single")
    (
        df.orderBy("a").coalesce(1)
        .write.options(**rg_conf).mode("overwrite").parquet(single)
    )
    zpath = str(tmp_path / "zorder")
    (
        zorder_by(df, "a", "b", bits=14).coalesce(1)
        .write.options(**rg_conf).mode("overwrite").parquet(zpath)
    )

    sa, sb = _avg_rowgroup_span(single, "a", span), _avg_rowgroup_span(single, "b", span)
    za, zb = _avg_rowgroup_span(zpath, "a", span), _avg_rowgroup_span(zpath, "b", span)

    assert sa < 0.25          # plain sort: tight on the sort column...
    assert sb > 0.8           # ...and useless on the other
    # with G row groups a Z-curve rectangle spans ~sqrt(1/G) per axis;
    # assert both axes beat the ignored-column baseline decisively
    assert za < 0.5 and zb < 0.5   # z-order: tight-ish on BOTH
    assert max(za, zb) < sb * 0.6  # strictly better than the ignored column


def test_interleave_bits_roundtrip(spark):
    from chainhouse_spark.sinks.zorder import interleave_bits_sql

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (16383, 16383)], "a long, b long"
    )
    got = {
        (r.a, r.b): r.z
        for r in df.selectExpr(
            "a", "b", f"{interleave_bits_sql('a', 'b', 14)} AS z"
        ).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 2    # a occupies odd (higher) positions
    assert got[(0, 1)] == 1
    # interleave of all-ones is all-ones over 2*bits
    assert got[(16383, 16383)] == (1 << 28) - 1
    # z is monotone when both coordinates grow together
    assert got[(3, 5)] < got[(16383, 16383)]
