"""Sessionization semantics on crafted micro-data + the batch/stream
twin-equivalence property (SURVEY.md §5.4 — our TopologyTestDriver
substitute)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from demo_segmenter_spark.operators.layer_a import GAP_US
from tests.conftest import SF_SMOKE

UTC = dt.timezone.utc


def _sessionize_rows(spark, rows):
    """Run the batch sessionization core on literal (user, ts, id) rows."""
    from pyspark.sql import Window

    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | ((us - prev) > GAP_US), 1).otherwise(0)
    out = df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return {(r.user_id, r.event_id): r.session_id for r in out.collect()}


def test_gap_boundary_semantics(spark):
    """Events exactly GAP apart merge (Kafka SessionWindows inclusive
    gap); one µs past the gap starts a new session."""
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    gap = dt.timedelta(hours=8)
    eps = dt.timedelta(microseconds=1)
    rows = [
        (1, t0, 1),
        (1, t0 + gap, 2),            # exactly gap later -> same session
        (1, t0 + gap + gap + eps, 3),  # gap+1µs after #2 -> new session
        (2, t0, 4),                  # different user -> own session
    ]
    s = _sessionize_rows(spark, rows)
    assert s[(1, 1)] == s[(1, 2)]
    assert s[(1, 3)] == s[(1, 2)] + 1
    assert s[(2, 4)] == 1


def test_out_of_order_input_is_ordered_by_event_time(spark):
    """Sessionization is event-time based: shuffled input order must not
    change the result (the ORDER BY ts, event_id total order rules)."""
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    h = dt.timedelta(hours=1)
    rows = [(1, t0 + 20 * h, 2), (1, t0, 1), (1, t0 + 21 * h, 3)]
    s = _sessionize_rows(spark, rows)
    assert s[(1, 1)] == 1 and s[(1, 2)] == 2 and s[(1, 3)] == 2


def test_stream_batch_twin_equivalence(spark):
    """session_window streaming == batch lag/cumsum rewrite, exactly."""
    from demo_segmenter_spark.operators.layer_a import session_aggregates
    from demo_segmenter_spark.streaming.sessionize import sessionize_stream

    st = {tuple(r) for r in sessionize_stream(spark, SF_SMOKE).collect()}
    b = session_aggregates(spark, SF_SMOKE).select(
        "user_id",
        "session_start_us",
        F.col("session_end_us").alias("session_last_us"),
        "n_events",
        "sum_value",
    )
    assert st == {tuple(r) for r in b.collect()}


def test_capped_session_splits_long_session(spark):
    # crafted: events every hour for 20 hours = ONE gap-session (gap
    # 8h never trips) but the 16h cap must split it: events at t0..t0+16h
    # stay in session 1 (within cap), the t0+17h event starts session 2.
    import uuid

    from demo_segmenter_spark.operators.layer_a import (
        GAP_US,
        SESSION_CAP_US,
    )
    from demo_segmenter_spark.registry import REGISTRY

    h = 3_600_000_000
    base = 1_700_000_000_000_000
    rows = [(1, i, base + i * h) for i in range(21)]  # 0..20h hourly
    import os

    d = f"/tmp/dss_capped/{uuid.uuid4().hex[:8]}"
    os.makedirs(d, exist_ok=True)
    df = spark.createDataFrame(rows, "user_id long, event_id long, us long")
    df.select(
        "user_id", "event_id", F.timestamp_micros("us").alias("ts"),
        F.lit("view").alias("event_type"), F.lit(1.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {
        r.session_seq: (r.n_events, r.start_us, r.end_us)
        for r in REGISTRY["a_session_capped"].fn(spark, d).collect()
    }
    assert GAP_US == 8 * h and SESSION_CAP_US == 16 * h
    # session 1: hours 0..16 inclusive (16h span == cap, not over);
    # hour 17 is 17h after start -> over cap -> new session 2: 17..20
    assert got == {
        1: (17, base, base + 16 * h),
        2: (4, base + 17 * h, base + 20 * h),
    }, got
