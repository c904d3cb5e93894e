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


def _sink_dir(tag):
    import hashlib
    import os
    import shutil

    d = f"/tmp/dss_pysink/{hashlib.md5(tag.encode()).hexdigest()[:8]}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


def test_python_sink_round_trip(spark):
    from demo_segmenter_spark.sources.python_source import (
        manifest_files,
        register_sink,
    )

    register_sink(spark)
    d = _sink_dir("roundtrip")
    src = _read(spark, 400, 4)
    src.write.format("jsonl_dir").option("path", d).mode("append").save()
    files = manifest_files(d)
    assert files, "no manifest written"
    back = spark.read.schema(src.schema).json(files)
    assert back.count() == 400
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_python_sink_failure_leaves_no_manifest(spark):
    import pytest as _pytest

    from demo_segmenter_spark.sources.python_source import (
        manifest_files,
        register_sink,
    )

    register_sink(spark)
    d = _sink_dir("failure")
    src = _read(spark, 100, 2)
    with _pytest.raises(Exception):
        (
            src.write.format("jsonl_dir")
            .option("path", d)
            .option("simulate_failure", "true")
            .mode("append")
            .save()
        )
    # atomicity: the failed write is invisible to manifest readers
    assert manifest_files(d) == []
