"""EWMA recurrence family: third-implementation cross-check (pandas
ewm itself) and multi-batch streaming state carry.

The driver's oracle gate already certifies both twins against the
recursive-CTE replay in ONE micro-batch; here (1) pandas
ewm(alpha=.5, adjust=False) — an implementation neither engine shares —
must agree with the Spark batch result, and (2) the PAPI processor's
carried (y, n) state must survive micro-batch boundaries: an event's
smoothed value depends on the whole per-user prefix, so any state loss
at a batch cut shifts every later value.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from demo_segmenter_spark.sources import load_table
from demo_segmenter_spark.streaming.papi import (
    EWMA_OUTPUT_SCHEMA,
    EWMA_STATE_SCHEMA,
    _smooth_ewma,
)
from pyspark.sql.streaming.state import GroupStateTimeout
from tests.conftest import SF_SMOKE
from tests.test_stream_multibatch import SF, _read_stream, _run_to_memory, _trickle_src

load_all_operators()


def test_ewma_matches_pandas_ewm(spark):
    import pandas as pd

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value")
        .toPandas()
        .sort_values(["user_id", "ts_us", "event_id"])
    )
    want = {}
    for uid, g in ev.groupby("user_id"):
        sm = g["value"].ewm(alpha=0.5, adjust=False).mean()
        for eid, y in zip(g["event_id"], sm):
            want[(uid, eid)] = round(y + 1e-08, 4) + 0.0
    got = {
        (r.user_id, r.event_id): r.ewma
        for r in REGISTRY["a_ewma"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_ewma_stream_state_survives_batch_cuts(spark):
    src, n, _ = _trickle_src(spark)
    ev = _read_stream(spark, src).select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _smooth_ewma,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name, n_batches = _run_to_memory(out, "update")
    assert n_batches == 3, f"expected 3 micro-batches, saw {n_batches}"
    got = {tuple(r) for r in spark.table(name).collect()}
    want = {tuple(r) for r in REGISTRY["a_ewma"].fn(spark, SF).collect()}
    # every event emitted exactly once, every smoothed value equal to
    # the batch recurrence — i.e. the carried y crossed both cuts
    assert len(got) == n
    assert got == want
