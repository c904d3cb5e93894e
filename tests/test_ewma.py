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


# ---------------------------------------------------------------------------
# Property checks (pure Python, no Spark session — the Spark plumbing
# is certified by the oracle gate and the multibatch test above):
# on ARBITRARY series, the shared recurrence core must (1) agree with
# pandas ewm bit-for-bit after the standard round, and (2) be
# split-invariant — carrying (y, n) state across ANY chunking equals
# the whole-series result, which is exactly the guarantee the
# streaming twin relies on at every micro-batch boundary.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from demo_segmenter_spark.operators.layer_a import _ewma_rows

series_strategy = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(series_strategy, st.data())
def test_ewma_core_matches_pandas_and_is_split_invariant(xs, data):
    import pandas as pd

    whole, _, _ = _ewma_rows(xs, None, 0)
    want = [
        round(v + 1e-08, 4) + 0.0
        for v in pd.Series(xs).ewm(alpha=0.5, adjust=False).mean()
    ]
    assert whole == want
    # arbitrary chunking: state carry must reproduce the whole series
    n_cuts = data.draw(st.integers(min_value=0, max_value=4))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(xs)),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
    )
    bounds = [0] + cuts + [len(xs)]
    out, y, n = [], None, 0
    for lo, hi in zip(bounds, bounds[1:]):
        part, y, n = _ewma_rows(xs[lo:hi], y, n)
        out.extend(part)
    assert out == whole


def test_ewma_papi_state_recovers_across_restart(spark):
    # GroupState RECOVERY for the custom-processor class: phase 1 runs
    # the EWMA processor over the first two thirds into a checkpointed
    # parquet sink, then the last third arrives and the query RESTARTS
    # on the same checkpoint. The recovered (y, n) per-user state must
    # continue the recurrence exactly — every event row present
    # exactly once and every smoothed value equal to the batch twin
    # (any state loss at the restart shifts every later value, so this
    # is a sharp check, not a row-count one).
    import os
    import shutil
    import uuid

    from tests.test_stream_multibatch import CHUNK_SCHEMA

    base = f"/tmp/dss_stream_mb/ewma_restart_{uuid.uuid4().hex[:8]}"
    shutil.rmtree(base, ignore_errors=True)
    rows = (
        load_table(spark, SF, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("ts", "event_id")
        .collect()
    )
    n = len(rows)
    cut = [0, n // 3, 2 * n // 3, n]
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    os.makedirs(src)
    for i in range(3):
        d = f"{base}/b{i}"
        spark.createDataFrame(rows[cut[i] : cut[i + 1]], CHUNK_SCHEMA).coalesce(
            1
        ).write.parquet(d)

    def _arrive(i):
        d = f"{base}/b{i}"
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.symlink(f"{d}/{f}", f"{src}/{i}_{f}")

    def _run():
        ev = (
            spark.readStream.schema(CHUNK_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .select(
                "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
            )
        )
        smoothed = ev.groupBy("user_id").applyInPandasWithState(
            _smooth_ewma,
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        q = (
            smoothed.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _arrive(0)
    _arrive(1)
    _run()
    mid = spark.read.parquet(out).count()
    assert 0 < mid < n
    _arrive(2)
    _run()  # restart on the same checkpoint; only b2 is new
    got_df = spark.read.parquet(out)
    assert got_df.count() == n  # exactly once, no re-emission
    got = {tuple(r) for r in got_df.collect()}
    want = {tuple(r) for r in REGISTRY["a_ewma"].fn(spark, SF).collect()}
    assert got == want
