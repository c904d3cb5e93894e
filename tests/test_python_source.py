"""Spark 4 custom Python Data Source: partition-parallel deterministic
ingest via sources/python_source.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_segmenter_spark.sources.python_source import register


def _read(spark, rows, parts):
    register(spark)
    return (
        spark.read.format("synthetic_events")
        .option("rows", rows)
        .option("partitions", parts)
        .load()
    )


def test_reads_expected_rows_and_schema(spark):
    df = _read(spark, 500, 4)
    assert df.columns == ["event_id", "user_id", "event_type", "value"]
    assert df.count() == 500
    assert df.select("event_id").distinct().count() == 500


def test_partitioning_does_not_change_relation(spark):
    # Content is a pure function of event_id: 2 partitions and 7
    # partitions must produce the identical relation.
    a = _read(spark, 300, 2)
    b = _read(spark, 300, 7)
    assert a.rdd.getNumPartitions() == 2
    assert b.rdd.getNumPartitions() == 7
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_composes_with_engine_operators(spark):
    # The custom source is a first-class relation: aggregate it.
    agg = (
        _read(spark, 1000, 4)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    rows = {r["event_type"]: r["n"] for r in agg.collect()}
    assert sum(rows.values()) == 1000
    assert set(rows) <= {"click", "view", "purchase", "signup", "error"}
