"""Custom Python Data Source (Spark 4 DataSource API): a deterministic
synthetic-events generator, registered as format "synthetic_events".

This is the Spark-4-native answer to "write a connector in Python" —
the reference's ingest side is a Kafka consumer [REF?, SURVEY.md §1.1];
a production twin of this class would wrap any system with a Python
client. The key scale property is partition-parallel reads: the
planner calls partitions() once on the driver, then each executor
reads ONLY its InputPartition — generation (or fetching) never funnels
through the driver.

Determinism contract: row content is a pure function of (event_id), so
any partitioning yields the same relation — asserted in
tests/test_python_source.py by reading with different partition counts.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _row(i: int):
    # Pure function of i — cheap multiplicative hashing, stable across
    # partitionings and runs (no RNG state).
    h = (i * 2654435761) % (1 << 32)
    return (
        i,
        h % 1000,
        EVENT_TYPES[h % len(EVENT_TYPES)],
        round((h % 100_000) / 100.0, 2),
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):
        p = max(1, min(self.n_parts, self.n_rows))
        bounds = [round(i * self.n_rows / p) for i in range(p + 1)]
        return [_Range(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticEventsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsSource)
