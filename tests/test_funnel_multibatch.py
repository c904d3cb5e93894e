"""Cross-batch state for the PAPI funnel (streaming/papi.py): replay
the fixture events in THREE ts-ordered micro-batches and assert the
state machine carries stage progress across batch boundaries — the
result must equal the batch funnel (REGISTRY['a_funnel']) exactly.
This exercises the ordering contract the processor documents: per-user
event-time order across batches (file replay in ts order)."""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from demo_segmenter_spark.sources import load_table
from demo_segmenter_spark.streaming.papi import (
    FUNNEL_OUTPUT_SCHEMA,
    FUNNEL_STATE_SCHEMA,
    _advance_funnel,
)
from tests.conftest import SF_SMOKE

load_all_operators()


def _write_three_batches(spark, base):
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "user_id", "event_id", "event_type",
            F.unix_micros("ts").alias("ts_us"),
        )
        .orderBy("ts_us", "event_id")
        .collect()
    )
    n = len(ev)
    chunks = [ev[: n // 3], ev[n // 3 : 2 * n // 3], ev[2 * n // 3 :]]
    src = f"{base}/src"
    os.makedirs(src)
    now = time.time()
    for i, chunk in enumerate(chunks):
        d = f"{base}/b{i}"
        spark.createDataFrame(
            chunk, "user_id long, event_id long, event_type string, ts_us long"
        ).coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.symlink(f"{d}/{f}", f"{src}/{i}_{f}")
                os.utime(
                    f"{src}/{i}_{f}", (now + i * 10, now + i * 10),
                    follow_symlinks=False,
                )
    return src, n


def test_funnel_state_survives_batch_boundaries(spark):
    base = f"/tmp/dss_funnel_mb/{uuid.uuid4().hex[:8]}"
    src, n = _write_three_batches(spark, base)

    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, event_type string, ts_us long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _advance_funnel,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"funnel_mb_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = sum(
        1 for p in q.recentProgress if p["numInputRows"] > 0
    )
    assert n_batches == 3, f"expected 3 micro-batches, saw {n_batches}"

    per_user = (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("t1").alias("t1"),
            F.max("t2").alias("t2"),
            F.max("t3").alias("t3"),
        )
    )
    got = per_user.agg(
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_view_click_purchase"),
    ).first()
    want = REGISTRY["a_funnel"].fn(spark, SF_SMOKE).first()
    assert (got.n_view, got.n_view_click, got.n_view_click_purchase) == (
        want.n_view, want.n_view_click, want.n_view_click_purchase
    )
