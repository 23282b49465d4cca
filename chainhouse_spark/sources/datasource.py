"""Custom PySpark DataSource: `spark.read.format("ethereum")`.

The Spark-4-native packaging of the distributed RPC scan (SURVEY.md §2.1
S2–S5): the block range is split into contiguous InputPartitions; each
partition's read() runs ON AN EXECUTOR, opens one JSON-RPC client, and
fetches its heights with bounded retries — the same dataflow as
sources.rpc.raw_blocks_from_rpc, but discoverable through the standard
reader API and catalog-friendly:

    spark.dataSource.register(EthereumDataSource)
    df = (spark.read.format("ethereum")
          .option("endpoint", "http://node:8545")
          .option("from", 18_000_000).option("to", 18_000_999)
          .option("parallelism", 64)
          .load())            # schema: schemas.RAW_BLOCK

Options:
    endpoint       JSON-RPC HTTP endpoint (required unless transport=fixture)
    from, to       inclusive block range (required)
    parallelism    number of input partitions (default 32)
    throttle_sec   per-height sleep inside a partition (rate limiting)
    transport      "http" (default) | "fixture" (deterministic offline blocks)
    seed           fixture seed (default 42)

The fixture transport serves the same deterministic raw blocks as
sources.fixtures — tests drive the full reader path with zero network.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from chainhouse_spark.schemas import RAW_BLOCK


class HeightSlice(InputPartition):
    def __init__(self, start: int, end: int):  # inclusive range
        self.start = start
        self.end = end


def _row_tuple(d: dict, schema) -> tuple:
    """Recursively convert a RAW_BLOCK-shaped dict into a tuple matching the
    schema's field order (the DataSource reader contract)."""
    from pyspark.sql.types import ArrayType, StructType

    out = []
    for f in schema.fields:
        v = d.get(f.name) if d is not None else None
        if isinstance(f.dataType, StructType):
            out.append(None if v is None else _row_tuple(v, f.dataType))
        elif isinstance(f.dataType, ArrayType) and isinstance(
            f.dataType.elementType, StructType
        ):
            out.append(
                None
                if v is None
                else [_row_tuple(x, f.dataType.elementType) for x in v]
            )
        else:
            out.append(v)
    return tuple(out)


class EthereumReader(DataSourceReader):
    def __init__(self, options: dict):
        self.endpoint = options.get("endpoint")
        self.from_block = int(options["from"])
        self.to_block = int(options["to"])
        self.parallelism = int(options.get("parallelism", 32))
        self.throttle_sec = float(options.get("throttle_sec", 0.0))
        self.transport = options.get("transport", "http")
        self.seed = int(options.get("seed", 42))
        if self.transport == "http" and not self.endpoint:
            raise ValueError("ethereum source: endpoint option is required")

    def partitions(self):
        n_heights = self.to_block - self.from_block + 1
        n_parts = max(1, min(self.parallelism, n_heights))
        step = -(-n_heights // n_parts)
        return [
            HeightSlice(s, min(s + step - 1, self.to_block))
            for s in range(self.from_block, self.to_block + 1, step)
        ]

    def read(self, partition: HeightSlice) -> Iterator[tuple]:
        heights = range(partition.start, partition.end + 1)
        if self.transport == "fixture":
            from chainhouse_spark.sources.fixtures import generate_raw_blocks

            # fixture blocks are numbered 0..n-1 from the seed; serve the
            # requested heights from one deterministic generation.
            blocks = generate_raw_blocks(partition.end + 1, seed=self.seed)
            for h in heights:
                yield _row_tuple(blocks[h], RAW_BLOCK)
            return
        from chainhouse_spark.sources.rpc import fetch_heights, http_transport

        transport = http_transport(self.endpoint)
        for parsed in fetch_heights(
            list(heights), transport, throttle_sec=self.throttle_sec
        ):
            yield _row_tuple(parsed, RAW_BLOCK)


class EthereumDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ethereum"

    def schema(self):
        return RAW_BLOCK

    def reader(self, schema) -> EthereumReader:
        return EthereumReader(self.options)


def register_ethereum_source(spark) -> None:
    spark.dataSource.register(EthereumDataSource)
