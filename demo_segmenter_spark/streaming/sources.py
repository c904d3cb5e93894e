"""Streaming sources: the parquet fixtures replayed as micro-batch
streams (the Kafka-topic twin of sources/tables.py — SURVEY.md §1.1).

At 100 TB / production this is `spark.readStream.format("kafka")` (or a
file stream over an arriving-partitions directory); the query topology
downstream is identical — that is the point of Structured Streaming's
unified batch/stream model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_raw_schema(sf_dir: str) -> tuple[T.StructType, bool]:
    """File streams need an explicit schema, and the fixture's `ts`
    encoding has changed across drops (TIMESTAMP(NANOS) early, plain µs
    TIMESTAMP_NTZ later). Sniff the parquet footer (pyarrow, no Spark
    job) and return (raw schema, ts_is_raw_nanos)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts_type = pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type
    if not pa.types.is_timestamp(ts_type):
        raise TypeError(
            f"events.ts: expected a parquet timestamp column, got {ts_type}"
        )
    # Inspect (unit, tz) structurally, not via the stringified type: with
    # nanosAsLong any ns column (tz-adjusted or not) arrives as LongType;
    # non-ns columns are LTZ iff the parquet logical type carries a tz
    # (isAdjustedToUTC), else NTZ.
    nanos = ts_type.unit == "ns"
    if nanos:
        ts_field = T.StructField("ts", T.LongType())  # TIMESTAMP(NANOS) read as long
    elif ts_type.tz is not None:
        ts_field = T.StructField("ts", T.TimestampType())
    else:
        ts_field = T.StructField("ts", T.TimestampNTZType())
    return (
        T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                ts_field,
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("props", T.StringType()),
            ]
        ),
        nanos,
    )


def _stream_dir(sf_dir: str, name: str) -> str:
    """Spark's file-stream source requires a *directory*; the fixture is
    one file per table. Build a /tmp symlink dir per (sf_dir, table) —
    read-only on the fixture, idempotent, race-safe."""
    import hashlib
    import os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    d = f"/tmp/dss_stream/{tag}/{name}"
    os.makedirs(d, exist_ok=True)
    link = f"{d}/{name}.parquet"
    if not os.path.lexists(link):
        try:
            os.symlink(f"{sf_dir}/{name}.parquet", link)
        except FileExistsError:
            pass
    return d


def stream_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders as an unbounded stream — the second changelog topic of
    the cogroup / KTable topologies. This helper OWNS the stream-side
    orders schema (file streams require one explicitly): it is sniffed
    from the parquet footer via pyarrow, so a fixture type tweak
    surfaces here — loudly, in one place — instead of silently
    misreading per-query schema copies. orders carries no ns-encoded
    column in any fixture drop, so no ts normalization is needed; if a
    drop ever adds one, the assert below fails with the real cause."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    arrow = pq.read_schema(f"{sf_dir}/orders.parquet")
    for field in arrow:
        if pa.types.is_timestamp(field.type) and field.type.unit == "ns":
            raise TypeError(
                f"orders.{field.name} is TIMESTAMP(NANOS); stream_orders "
                "needs the events-style nanos normalization added"
            )
    schema = from_arrow_schema(arrow, prefer_timestamp_ntz=True)
    return spark.readStream.schema(schema).parquet(_stream_dir(sf_dir, "orders"))


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as an unbounded stream; same ts normalization as the batch
    loader (sources/tables.py): raw nanos → truncate to µs, µs NTZ →
    cast to session-TZ (UTC) TimestampType."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema, nanos = _events_raw_schema(sf_dir)
    raw = spark.readStream.schema(schema).parquet(_stream_dir(sf_dir, "events"))
    ts = (
        F.timestamp_micros(F.expr("ts DIV 1000"))
        if nanos
        else F.col("ts").cast("timestamp")
    )
    return raw.select(
        "event_id",
        ts.alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
