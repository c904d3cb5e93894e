"""True watermark late-data semantics (SURVEY.md §2 `a_late_data` row,
streaming side): replay events in TWO micro-batches — the second
containing only an event far older than the first batch's max ts — and
assert the windowed aggregation drops it once the watermark has
advanced past its event time. This is Kafka Streams' grace-period drop
(SessionWindows.grace [PK]) expressed as Spark's watermark eviction,
exercised for real (multi-batch), not just as the batch rewrite."""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import functions as F


def _write_two_batches(spark, base):
    """Batch 1: 3 on-time events on 2024-01-10/11. Batch 2 (arrives
    later): 1 event back on 2024-01-01 — 9 days late, far beyond the
    1-hour watermark delay."""
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    on_time = spark.createDataFrame(
        [
            (1, "2024-01-10 10:00:00", 7),
            (2, "2024-01-10 11:00:00", 7),
            (3, "2024-01-11 09:00:00", 8),
        ],
        "event_id long, ts_s string, user_id long",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id")
    late = spark.createDataFrame(
        [(4, "2024-01-01 00:00:00", 7)],
        "event_id long, ts_s string, user_id long",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id")

    on_time.coalesce(1).write.parquet(f"{base}/b1")
    late.coalesce(1).write.parquet(f"{base}/b2")
    # File-stream order follows modification time: make b2 strictly newer.
    now = time.time()
    for i, d in enumerate(("b1", "b2")):
        for f in os.listdir(f"{base}/{d}"):
            os.utime(f"{base}/{d}/{f}", (now + i * 10, now + i * 10))
    src = f"{base}/src"
    os.makedirs(src)
    for i, d in enumerate(("b1", "b2")):
        for f in os.listdir(f"{base}/{d}"):
            if f.endswith(".parquet"):
                os.symlink(f"{base}/{d}/{f}", f"{src}/{i}_{f}")
                os.utime(f"{src}/{i}_{f}", (now + i * 10, now + i * 10), follow_symlinks=False)
    return src


def test_watermark_drops_late_event(spark):
    base = f"/tmp/dss_late/{uuid.uuid4().hex[:8]}"
    src = _write_two_batches(spark, base)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table(name).agg(F.sum("n")).collect()[0][0]
    # 3 on-time events emitted; the 2024-01-01 event arrived after the
    # watermark passed 2024-01-11 08:00 and must be dropped.
    assert got == 3, f"late event not dropped: emitted {got} events"

    # The batch twin (no watermark) sees all 4 — the drop is a
    # streaming-policy choice, not data loss in the source.
    assert spark.read.parquet(src).count() == 4
