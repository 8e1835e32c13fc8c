"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`): a
deterministic synthetic-events generator, registered as a real scan the
planner treats like any other source (partition pruning by the source's
own partitioning, schema projection handled by Spark).

Why it exists: the reference repo class reads ad-hoc text files; a
Spark-native engine instead exposes generators/feeds through the
DataSource API so EVERYTHING upstream of a query — including synthetic
load or replayed feeds — arrives as a partitioned, schema'd scan. The
generator is hash-deterministic (no RNG state), so two scans of the same
options produce identical rows on any executor layout — the same
reproducibility rule as the md5 sampling/sharding operators.

Usage:
    spark.dataSource.register(SyntheticEventsSource)
    df = spark.read.format("synthetic_events").option("n_rows", 1000).load()
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in µs


def _h(i: int, field: str) -> int:
    """Deterministic 64-bit hash stream per (row, field)."""
    d = hashlib.md5(f"{i}:{field}".encode()).digest()
    return int.from_bytes(d[:8], "big")


class SyntheticEventsSource(DataSource):
    """spark.read.format("synthetic_events").option("n_rows", N)
    .option("n_partitions", P).load() — N rows split into P ranges."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("event_id", LongType()),
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
                StructField("value", DoubleType()),
                StructField("ts_us", LongType()),
            ]
        )

    def reader(self, schema: StructType) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 4))

    def partitions(self):
        per = max(1, self.n_rows // self.n_partitions)
        bounds = list(range(0, self.n_rows, per)) + [self.n_rows]
        return [_Range(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (
                i,
                _h(i, "user") % 1000,
                EVENT_TYPES[_h(i, "type") % len(EVENT_TYPES)],
                round((_h(i, "value") % 50_000) / 100.0, 2),
                BASE_TS_US + (_h(i, "ts") % (30 * 24 * 3600)) * 1_000_000,
            )
