"""Per-micro-batch session emission semantics — the documented
difference vs Kafka Streams (SURVEY.md §4): KStreams emits a session
update per record; Spark session_window supports only append/complete
output (update mode raises STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION
— pinned below), so intermediate results are observed per micro-batch
via foreachBatch. With one user's events split across two batches
inside one gap, batch 0 must show the 2-event session and batch 1 the
same session grown to 3 — and the final snapshot equals the batch-mode
result the oracle checks."""

from __future__ import annotations

import os
import time
import uuid

import pytest
from pyspark.sql import functions as F


def _two_batch_source(spark, base):
    b1 = spark.createDataFrame(
        [(1, "2024-01-10 10:00:00", 7), (2, "2024-01-10 11:00:00", 7)],
        "event_id long, ts_s string, user_id long",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id")
    b2 = spark.createDataFrame(
        [(3, "2024-01-10 12:00:00", 7)],
        "event_id long, ts_s string, user_id long",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id")
    src = f"{base}/src"
    os.makedirs(src)
    now = time.time()
    for i, df in enumerate((b1, b2)):
        d = f"{base}/b{i}"
        df.coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.symlink(f"{d}/{f}", f"{src}/{i}_{f}")
                os.utime(f"{src}/{i}_{f}", (now + i * 10,) * 2, follow_symlinks=False)
    return src


def _session_stream(spark, src):
    return (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "0 seconds")
        .groupBy(F.session_window("ts", "8 hours").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", "n_events")
    )


def test_session_grows_across_micro_batches(spark):
    base = f"/tmp/dss_update/{uuid.uuid4().hex[:8]}"
    os.makedirs(base)
    src = _two_batch_source(spark, base)
    snapshots: list[list[int]] = []

    def capture(batch_df, batch_id):
        snapshots.append(sorted(r["n_events"] for r in batch_df.collect()))

    q = (
        _session_stream(spark, src)
        .writeStream.foreachBatch(capture)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert snapshots == [[2], [3]], snapshots


def test_session_window_rejects_update_mode(spark):
    base = f"/tmp/dss_update/{uuid.uuid4().hex[:8]}"
    os.makedirs(base)
    src = _two_batch_source(spark, base)
    with pytest.raises(Exception, match="STREAMING_OUTPUT_MODE|update"):
        (
            _session_stream(spark, src)
            .writeStream.format("memory")
            .queryName(f"u_{uuid.uuid4().hex[:8]}")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
