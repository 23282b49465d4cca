"""Custom `ethereum` DataSource: partition slicing, fixture-transport reads,
equivalence with the fixture DataFrame, and downstream transform compat."""

from __future__ import annotations

from chainhouse_spark.sources.datasource import (
    EthereumReader,
    register_ethereum_source,
)


def _read(spark, **opts):
    register_ethereum_source(spark)
    r = spark.read.format("ethereum")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_partition_slicing():
    r = EthereumReader({"from": "0", "to": "9", "parallelism": "4", "transport": "fixture"})
    parts = r.partitions()
    covered = [h for p in parts for h in range(p.start, p.end + 1)]
    assert covered == list(range(10))
    assert len(parts) == 4
    # never more partitions than heights
    r1 = EthereumReader({"from": "5", "to": "6", "parallelism": "32", "transport": "fixture"})
    assert len(r1.partitions()) == 2


def test_fixture_read_matches_fixture_df(spark):
    from chainhouse_spark.sources.fixtures import raw_blocks_df

    got = _read(spark, **{"from": 0, "to": 7, "transport": "fixture", "seed": 42,
                          "parallelism": 3})
    exp = raw_blocks_df(spark, n_blocks=8, seed=42)
    assert got.schema == exp.schema
    g = {bytes(r.hash).hex() for r in got.select("hash").collect()}
    e = {bytes(r.hash).hex() for r in exp.select("hash").collect()}
    assert g == e and len(g) == 8


def test_transforms_run_on_datasource(spark):
    from chainhouse_spark.transforms import all_tables_from_raw

    raw = _read(spark, **{"from": 0, "to": 4, "transport": "fixture"})
    tables = all_tables_from_raw(raw)
    assert tables["blocks"].count() == 5
    assert tables["transactions"].count() > 0
    # parent denormalization survived the source swap
    row = tables["transactions"].select("blockNumber").first()
    assert row.blockNumber is not None


def test_http_requires_endpoint():
    import pytest

    with pytest.raises(ValueError):
        EthereumReader({"from": "0", "to": "1"})
