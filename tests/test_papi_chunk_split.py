"""PAPI processors vs Arrow chunk splitting (round-6 ADVICE medium).

applyInPandasWithState hands a group's micro-batch data to the
processor as an ITERATOR of pandas chunks, split at
spark.sql.execution.arrow.maxRecordsPerBatch, with NO intra-group row
ordering guarantee — a later chunk can carry earlier timestamps. Both
order-sensitive processors (_smooth_ewma's recurrence, _session_final's
session fold) must therefore concatenate all chunks BEFORE sorting and
folding. These tests make the hazard real: the source is written in
DESCENDING event time and maxRecordsPerBatch is forced to 7 (fixture
has users with up to 88 events in one micro-batch), so chunk-local
sorting would fold the latest events first and mis-compute. The
processors must still match their batch twins exactly.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from demo_segmenter_spark.functions.compat import cents as cents_expr
from demo_segmenter_spark.operators.layer_a import SESSION_GRACE_US
from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from demo_segmenter_spark.sources import load_table
from demo_segmenter_spark.streaming.papi import (
    EWMA_OUTPUT_SCHEMA,
    EWMA_STATE_SCHEMA,
    SESSION_FINAL_OUTPUT_SCHEMA,
    SESSION_FINAL_STATE_SCHEMA,
    _session_final,
    _smooth_ewma,
)
from pyspark.sql.streaming.state import GroupStateTimeout
from tests.test_stream_multibatch import SF, CHUNK_SCHEMA, _run_to_memory

load_all_operators()

_BATCH_KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"


@pytest.fixture()
def desc_source(spark):
    """Events written as ONE file in descending (ts, event_id) order —
    one micro-batch whose per-user chunks arrive newest-first."""
    base = f"/tmp/dss_stream_mb/chunksplit_{uuid.uuid4().hex[:8]}"
    shutil.rmtree(base, ignore_errors=True)
    src = f"{base}/src"
    (
        load_table(spark, SF, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .coalesce(1)
        .write.parquet(src)
    )
    old = spark.conf.get(_BATCH_KEY)
    spark.conf.set(_BATCH_KEY, "7")
    try:
        yield src
    finally:
        spark.conf.set(_BATCH_KEY, old)
        shutil.rmtree(base, ignore_errors=True)


def _read(spark, src):
    return (
        spark.readStream.schema(CHUNK_SCHEMA)
        .parquet(src)  # one file, no trigger cap -> ONE micro-batch
    )


def test_ewma_processor_survives_chunk_split(spark, desc_source):
    ev = _read(spark, desc_source).select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _smooth_ewma,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name, _ = _run_to_memory(out, "update")
    got = {tuple(r) for r in spark.table(name).collect()}
    want = {tuple(r) for r in REGISTRY["a_ewma"].fn(spark, SF).collect()}
    assert got == want


def test_session_final_processor_survives_chunk_split(spark, desc_source):
    grace_sec = SESSION_GRACE_US // 1_000_000
    ev = (
        _read(spark, desc_source)
        .withWatermark("ts", f"{grace_sec} seconds")
        .select(
            "user_id",
            "event_id",
            "ts",
            F.unix_micros("ts").alias("ts_us"),
            cents_expr(F.col("value")).alias("cents"),
        )
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _session_final,
        outputStructType=SESSION_FINAL_OUTPUT_SCHEMA,
        stateStructType=SESSION_FINAL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    name, _ = _run_to_memory(out, "append")
    cols = [f.name for f in SESSION_FINAL_OUTPUT_SCHEMA.fields]
    got = {tuple(r) for r in spark.table(name).select(*cols).collect()}
    want = {
        tuple(r)
        for r in REGISTRY["a_session_suppress"].fn(spark, SF).select(*cols).collect()
    }
    assert got == want


def test_throttle_processor_survives_chunk_split(spark, desc_source):
    # Admission order is (ts, event_id); the descending source +
    # 7-row chunks would admit the LAST 3 events of each hour if the
    # processor folded chunk-locally. Must equal the streaming twin's
    # registered result (same emission rule → same oracle).
    from demo_segmenter_spark.streaming.papi import (
        THROTTLE_OUTPUT_SCHEMA,
        THROTTLE_STATE_SCHEMA,
        _throttle_final,
    )

    ev = (
        _read(spark, desc_source)
        .withWatermark("ts", "0 seconds")
        .select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "ts")
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _throttle_final,
        outputStructType=THROTTLE_OUTPUT_SCHEMA,
        stateStructType=THROTTLE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    name, _ = _run_to_memory(out, "append")
    got = {tuple(r) for r in spark.table(name).collect()}
    want = {tuple(r) for r in REGISTRY["a_throttle_stream"].fn(spark, SF).collect()}
    assert got == want
