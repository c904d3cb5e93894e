"""Multi-batch certification for the remaining streaming twins.

The driver's oracle gate runs each `_stream` query over the fixture in
ONE micro-batch (AvailableNow over a single file), which proves the
topology but not that state survives micro-batch boundaries. Here the
sf0.01 events are replayed in THREE ts-ordered batches
(maxFilesPerTrigger=1) and each streaming result must equal its batch
twin exactly:

- session_window sessions SPANNING batch boundaries must merge in the
  state store (sessions are ~8h apart; the time-ordered thirds cut
  through thousands of open sessions);
- the stream-stream band join must buffer clicks across batches until
  their purchase arrives;
- dropDuplicatesWithinWatermark must drop duplicates that arrive in a
  LATER batch than the original (planted copies).

Companion to tests/test_funnel_multibatch.py (PAPI funnel) and
tests/test_late_data.py (watermark drops).
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import functions as F

from demo_segmenter_spark.operators.layer_a import GAP_INTERVAL
from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from demo_segmenter_spark.sources import load_table
from demo_segmenter_spark.functions.compat import cents, rnd

load_all_operators()

SF = "/root/testdata/sf0.01"
CHUNK_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def _trickle_src(spark, n_batches=3, plant_dups=0):
    """Write the sf0.01 events as n ts-ordered parquet files whose
    mtimes force one-file-per-trigger replay order. plant_dups>0 copies
    that many tail rows of chunk i into chunk i+1 (cross-batch exact
    duplicates for the dedup test). Returns (src_dir, rows, n_dups)."""
    base = f"/tmp/dss_stream_mb/{uuid.uuid4().hex[:8]}"
    shutil.rmtree(base, ignore_errors=True)
    rows = (
        load_table(spark, SF, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("ts", "event_id")
        .collect()
    )
    n = len(rows)
    cut = [0, n // 3, 2 * n // 3, n]
    chunks = [rows[cut[i] : cut[i + 1]] for i in range(n_batches)]
    if plant_dups:
        for i in range(n_batches - 1):
            chunks[i + 1] = chunks[i][-plant_dups:] + chunks[i + 1]
    src = f"{base}/src"
    os.makedirs(src)
    now = time.time()
    for i, chunk in enumerate(chunks):
        d = f"{base}/b{i}"
        spark.createDataFrame(chunk, CHUNK_SCHEMA).coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.symlink(f"{d}/{f}", f"{src}/{i}_{f}")
                os.utime(
                    f"{src}/{i}_{f}", (now + i * 10, now + i * 10),
                    follow_symlinks=False,
                )
    return src, n, plant_dups * (n_batches - 1)


def _run_to_memory(out, mode):
    name = f"mb_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = sum(1 for p in q.recentProgress if p["numInputRows"] > 0)
    return name, n_batches


def _read_stream(spark, src):
    return (
        spark.readStream.schema(CHUNK_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _rowset(df):
    return {tuple(r) for r in df.collect()}


def test_sessionize_stream_across_batches(spark):
    src, _, _ = _trickle_src(spark)
    ev = _read_stream(spark, src).withWatermark("ts", "0 seconds")
    agg = ev.groupBy(
        F.session_window("ts", GAP_INTERVAL).alias("w"), "user_id"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(cents(F.col("value"))).alias("sum_cents"),
    )
    out = agg.select(
        "user_id",
        F.unix_micros("w.start").alias("session_start_us"),
        (F.unix_micros("w.end") - 8 * 3600 * 1_000_000).alias("session_last_us"),
        "n_events",
        rnd(F.col("sum_cents") / 100.0, 2).alias("sum_value"),
    )
    name, n_batches = _run_to_memory(out, "complete")
    assert n_batches == 3, f"expected 3 micro-batches, saw {n_batches}"
    got = _rowset(spark.table(name))
    want = _rowset(REGISTRY["a_session_agg_native"].fn(spark, SF))
    # Sessions open at a batch boundary must have merged in state:
    # row-for-row equality with the batch twin proves it (4766
    # sessions at sf0.01, ~2.1 events each, thirds cut mid-session).
    assert got == want


def test_stream_stream_join_across_batches(spark):
    src, _, _ = _trickle_src(spark)
    ev = _read_stream(spark, src)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"), "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 12 HOURS")),
    ).select(
        "purchase_id",
        "user_id",
        "click_id",
        F.unix_micros("p_ts").alias("purchase_ts_us"),
        F.unix_micros("c_ts").alias("click_ts_us"),
    )
    name, n_batches = _run_to_memory(joined, "append")
    assert n_batches == 3
    got = _rowset(spark.table(name))
    want = _rowset(REGISTRY["a_stream_stream_join"].fn(spark, SF))
    # Clicks buffered in batch 1 must still match purchases arriving
    # in batches 2-3 (the 12h band spans the batch cuts).
    assert got == want


def test_dedup_drops_cross_batch_duplicates(spark):
    src, n, n_planted = _trickle_src(spark, plant_dups=25)
    assert n_planted == 50
    ev = (
        _read_stream(spark, src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id")
    )
    name, n_batches = _run_to_memory(ev, "append")
    assert n_batches == 3
    out = spark.table(name)
    # The 50 planted copies arrived one batch AFTER their originals,
    # inside the watermark — state must recognize and drop every one.
    assert out.count() == n
    assert out.select("event_id").distinct().count() == n


def test_suppress_emits_final_incrementally_across_batches(spark):
    # suppress(untilWindowCloses) semantics under real micro-batch
    # advancement: 1-day windows in APPEND mode with a 1h watermark
    # over three ts-ordered batches. Each window must be emitted (a)
    # exactly once, (b) only after the watermark passed its end, and
    # (c) INCREMENTALLY — closed windows flush in the batch after
    # their close, not in one final dump. The final emitted set must
    # equal the batch twin (closed windows only).
    from demo_segmenter_spark.functions.compat import money_sum

    src, _, _ = _trickle_src(spark)
    ev = _read_stream(spark, src).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            money_sum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    name = f"mb_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = [
        (p["numInputRows"], p["sink"]["numOutputRows"])
        for p in q.recentProgress
    ]
    data_batches = [p for p in progress if p[0] > 0]
    assert len(data_batches) == 3, progress
    # (c): at least one window closed and flushed while data was still
    # arriving (the thirds span >1 day each), and the last data batch
    # cannot have been the only emitter.
    emitted_early = sum(out for _, out in data_batches[1:-1])
    assert emitted_early > 0, progress
    got = _rowset(spark.table(name))
    want = _rowset(REGISTRY["a_suppress_emit_final"].fn(spark, SF))
    assert got == want


def test_outer_join_nulls_across_batches(spark):
    # Left-outer stream-stream join under real micro-batch advancement:
    # unmatched purchases must emit NULL rows as the min-policy
    # watermark passes them MID-STREAM (not only in the closing
    # no-data batch), and the final set must equal the batch twin,
    # which models the eviction boundary explicitly.
    from demo_segmenter_spark.operators.layer_a import _outer_join_parts

    src, _, _ = _trickle_src(spark)
    ev = _read_stream(spark, src)
    out = _outer_join_parts(ev, streaming=True)
    name = f"mb_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = [
        (p["numInputRows"], p["sink"]["numOutputRows"])
        for p in q.recentProgress
    ]
    assert sum(1 for i, _ in progress if i > 0) == 3, progress
    got = _rowset(spark.table(name))
    want = _rowset(REGISTRY["a_stream_stream_join_outer"].fn(spark, SF))
    assert got == want
    # nulls present at all (the fixture has unmatched purchases)
    assert any(r[2] is None for r in got)


def test_suppress_exactly_once_across_restart(spark):
    # Windowed-aggregation STATE RECOVERY: run the suppress topology to
    # completion on the first two thirds of the stream (some windows
    # close and flush to a checkpointed parquet sink), then the last
    # third ARRIVES and the query restarts on the same checkpoint. The
    # restarted run must recover open-window state + watermark from the
    # checkpoint, process only the new file, and the sink must end up
    # with each closed window EXACTLY once — equal to the batch twin
    # over the full fixture.
    from demo_segmenter_spark.functions.compat import money_sum

    base = f"/tmp/dss_stream_mb/restart_{uuid.uuid4().hex[:8]}"
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
        agg = (
            spark.readStream.schema(CHUNK_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(
                F.count("*").alias("n_events"),
                money_sum(F.col("value")).alias("sum_value"),
            )
            .select(
                F.unix_micros("w.start").alias("window_start_us"),
                "event_type",
                "n_events",
                "sum_value",
            )
        )
        q = (
            agg.writeStream.format("parquet")
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
    assert mid > 0  # some windows closed during phase 1
    _arrive(2)
    _run()  # restart on the same checkpoint; only b2 is new
    got_df = spark.read.parquet(out)
    got = _rowset(got_df)
    assert len(got) > mid
    # each window emitted exactly once
    assert (
        got_df.groupBy("window_start_us", "event_type").count()
        .filter(F.col("count") > 1).count() == 0
    )
    want = _rowset(REGISTRY["a_suppress_emit_final"].fn(spark, SF))
    assert got == want


def test_papi_session_timeout_emits_incrementally(spark):
    # The event-time-timeout processor must flush sessions ACROSS the
    # run, not in one final dump: with three ts-ordered batches the
    # watermark advances twice mid-stream, so sessions whose close
    # boundary it passes flush in micro-batches BEFORE the closing
    # no-data batch (which fires the remaining timeouts). Final set ==
    # the batch twin (closed sessions only), each exactly once.
    from pyspark.sql.streaming.state import GroupStateTimeout

    from demo_segmenter_spark.functions.compat import cents
    from demo_segmenter_spark.operators.layer_a import SESSION_GRACE_US
    from demo_segmenter_spark.streaming.papi import (
        SESSION_FINAL_OUTPUT_SCHEMA,
        SESSION_FINAL_STATE_SCHEMA,
        _session_final,
    )

    src, _, _ = _trickle_src(spark)
    grace_sec = SESSION_GRACE_US // 1_000_000
    ev = (
        _read_stream(spark, src)
        .withWatermark("ts", f"{grace_sec} seconds")
        .select(
            "user_id",
            "event_id",
            "ts",
            F.unix_micros("ts").alias("ts_us"),
            cents(F.col("value")).alias("cents"),
        )
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _session_final,
        outputStructType=SESSION_FINAL_OUTPUT_SCHEMA,
        stateStructType=SESSION_FINAL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    name = f"sessfinal_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitting = [
        p["batchId"]
        for p in q.recentProgress
        if p["sink"].get("numOutputRows", 0) > 0
    ]
    assert len(emitting) >= 2, (
        f"sessions flushed only in batches {emitting} — not incremental"
    )
    rows = spark.table(name).collect()
    got = {tuple(r) for r in rows}
    assert len(got) == len(rows)  # exactly once
    want = {tuple(r) for r in REGISTRY["a_session_suppress"].fn(spark, SF).collect()}
    assert got == want


def test_window_dau_stream_across_batches(spark):
    # a_window_dau_stream's dedup→union→agg chain, fed one file per
    # trigger: (w_start, user) pairs straddle the batch cuts (each
    # 7-day window spans all three ts-thirds), so the dedup store must
    # carry distinct-set state across batches and the complete-mode
    # aggregate must converge to the batch relation exactly.
    from pyspark.sql import functions as F

    ev = _read_stream(spark, _trickle_src(spark)[0])
    ex = ev.select(
        "user_id", "ts", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k")
    ).select(
        "user_id",
        F.timestamp_add(
            "DAY", -F.col("k"), F.date_trunc("DAY", F.col("ts"))
        ).alias("w_start"),
    )
    raw = ex.select(
        "w_start", "user_id",
        F.lit(1).alias("is_event"), F.lit(0).alias("is_user"),
    )
    ded = ex.dropDuplicates(["w_start", "user_id"]).select(
        "w_start", "user_id",
        F.lit(0).alias("is_event"), F.lit(1).alias("is_user"),
    )
    agg = (
        raw.unionByName(ded)
        .groupBy("w_start")
        .agg(
            F.sum("is_event").alias("n_events"),
            F.sum("is_user").alias("active_users"),
        )
        .select(
            F.unix_micros("w_start").alias("window_start_us"),
            "active_users",
            "n_events",
        )
    )
    name, n_batches = _run_to_memory(agg, "complete")
    assert n_batches == 3, f"expected 3 micro-batches, saw {n_batches}"
    got = _rowset(spark.table(name))
    want = _rowset(REGISTRY["a_window_dau"].fn(spark, SF))
    assert got == want


def test_gapfill_locf_stream_across_batches(spark):
    # a_gapfill_locf_stream's rollup state must accumulate across
    # micro-batches: the trickle source splits each user's days over
    # three ts-thirds, so per-(user, day) sums straddle batch cuts and
    # the final fill must equal the batch twin exactly.
    import uuid

    from pyspark.sql import functions as F

    from demo_segmenter_spark.functions.compat import cents
    from demo_segmenter_spark.operators.layer_a import locf_grid

    ev = _read_stream(spark, _trickle_src(spark)[0])
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.sum(cents(F.col("value"))).alias("cents")
    )
    out = f"/tmp/dss_locf/mb_{uuid.uuid4().hex[:8]}"
    q = (
        daily.writeStream.outputMode("complete")
        .foreachBatch(lambda df, bid: df.write.mode("overwrite").parquet(out))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = sum(1 for p in q.recentProgress if p["numInputRows"] > 0)
    assert n_batches == 3, f"expected 3 micro-batches, saw {n_batches}"
    got = _rowset(locf_grid(spark.read.parquet(out)))
    want = _rowset(REGISTRY["a_gapfill_locf"].fn(spark, SF))
    assert got == want


def test_throttle_stream_across_batches(spark):
    # Quota counters must SURVIVE micro-batch boundaries: the three
    # ts-ordered batches cut through open hours, so a (user, hour)
    # whose 4th event arrives in a later batch must still be counted
    # against the quota admitted in the earlier batch. The result must
    # equal the registered streaming twin's oracle semantics exactly
    # (= batch a_throttle minus the trailing partial hour).
    from demo_segmenter_spark.streaming.papi import (
        THROTTLE_OUTPUT_SCHEMA,
        THROTTLE_STATE_SCHEMA,
        _throttle_final,
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    src, _, _ = _trickle_src(spark)
    ev = (
        _read_stream(spark, src)
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
    name, n_batches = _run_to_memory(out, "append")
    assert n_batches >= 3, "source must replay in multiple micro-batches"
    got = _rowset(spark.table(name))
    want = _rowset(REGISTRY["a_throttle_stream"].fn(spark, SF))
    assert got == want


def test_alert_hysteresis_stream_across_batches(spark):
    # The held alert bit must survive micro-batch boundaries: a user
    # raised in batch 0 whose clearing event arrives in batch 2 must
    # emit exactly one clear edge — equality with the batch twin
    # certifies every transition.
    from demo_segmenter_spark.streaming.papi import (
        ALERT_OUTPUT_SCHEMA,
        ALERT_STATE_SCHEMA,
        _alert_hysteresis,
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    src, _, _ = _trickle_src(spark)
    ev = _read_stream(spark, src).select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _alert_hysteresis,
        outputStructType=ALERT_OUTPUT_SCHEMA,
        stateStructType=ALERT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name, n_batches = _run_to_memory(out, "update")
    assert n_batches >= 3
    got = _rowset(spark.table(name))
    want = _rowset(REGISTRY["a_alert_hysteresis"].fn(spark, SF))
    assert got == want


def test_absence_stream_across_batches(spark):
    # Gaps whose two endpoint events land in DIFFERENT batches must
    # still surface with exact bounds — (last_ts, last_id) state carry.
    from demo_segmenter_spark.streaming.papi import (
        ABSENCE_OUTPUT_SCHEMA,
        ABSENCE_STATE_SCHEMA,
        _absence_gaps,
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    src, _, _ = _trickle_src(spark)
    ev = _read_stream(spark, src).select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _absence_gaps,
        outputStructType=ABSENCE_OUTPUT_SCHEMA,
        stateStructType=ABSENCE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name, n_batches = _run_to_memory(out, "update")
    assert n_batches >= 3
    got = _rowset(spark.table(name))
    want = _rowset(REGISTRY["a_absence"].fn(spark, SF))
    assert got == want


def test_attribution_stream_across_batches(spark):
    # A view in batch 0 must credit a purchase arriving in batch 2
    # (within the lookback): the (view_us, view_id) slot carries.
    from demo_segmenter_spark.streaming.papi import (
        ATTR_OUTPUT_SCHEMA,
        ATTR_STATE_SCHEMA,
        _attribution,
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    src, _, _ = _trickle_src(spark)
    ev = (
        _read_stream(spark, src)
        .filter(F.col("event_type").isin("view", "purchase"))
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            F.when(F.col("event_type") == "view", 0).otherwise(1).alias("kind"),
        )
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _attribution,
        outputStructType=ATTR_OUTPUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name, n_batches = _run_to_memory(out, "update")
    assert n_batches >= 3
    got = _rowset(spark.table(name))
    want = _rowset(REGISTRY["a_attribution"].fn(spark, SF))
    assert got == want


def test_cep_pattern_stream_across_batches(spark):
    # A view in one micro-batch must credit a purchase arriving later
    # (inside the horizon), and an error landing between them in a
    # MIDDLE batch must veto the match: both state slots carry.
    from demo_segmenter_spark.streaming.papi import (
        CEP_OUTPUT_SCHEMA,
        CEP_STATE_SCHEMA,
        _cep_pattern,
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    src, _, _ = _trickle_src(spark)
    ev = (
        _read_stream(spark, src)
        .filter(F.col("event_type").isin("view", "error", "purchase"))
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            F.when(F.col("event_type") == "view", 0)
            .when(F.col("event_type") == "error", 1)
            .otherwise(2)
            .alias("kind"),
        )
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _cep_pattern,
        outputStructType=CEP_OUTPUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name, n_batches = _run_to_memory(out, "update")
    assert n_batches >= 3
    got = _rowset(spark.table(name))
    want = _rowset(REGISTRY["a_cep_pattern"].fn(spark, SF))
    assert want, "fixture must yield at least one CEP match"
    assert got == want


def test_dynamic_gap_session_stream_across_batches(spark):
    # Dynamic-gap sessions spanning batch boundaries must merge with
    # the correct per-event horizon carried in state: a purchase's 2h
    # horizon open at a cut must still absorb the next batch's event,
    # while an error's 30min horizon must not.
    src, _, _ = _trickle_src(spark)
    gap = (
        F.when(F.col("event_type") == "error", F.lit("30 minutes"))
        .when(F.col("event_type") == "purchase", F.lit("2 hours"))
        .otherwise(F.lit(GAP_INTERVAL))
    )
    ev = _read_stream(spark, src).withWatermark("ts", "0 seconds")
    out = (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            rnd(F.sum(cents(F.col("value"))) / 100.0, 2).alias("sum_value"),
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_last_us"),
        )
        .select(
            "user_id", "session_start_us", "session_last_us",
            "n_events", "sum_value",
        )
    )
    name, n_batches = _run_to_memory(out, "complete")
    assert n_batches == 3, f"expected 3 micro-batches, saw {n_batches}"
    got = _rowset(spark.table(name))
    want = _rowset(REGISTRY["a_session_dynamic_gap"].fn(spark, SF))
    assert got == want


def test_new_vs_returning_state_across_batches(spark):
    # a_new_vs_returning_stream's state is per-user collect_set(day):
    # a user active in batches 1 and 3 must accumulate BOTH days in
    # one state row, and first-seen must resolve across the cut.
    ev = _read_stream(spark, _trickle_src(spark)[0])
    per_user = ev.groupBy("user_id").agg(
        F.collect_set(
            F.unix_micros(F.date_trunc("DAY", F.col("ts")))
        ).alias("days")
    )
    name, n_batches = _run_to_memory(per_user, "complete")
    assert n_batches == 3
    got = _rowset(
        spark.table(name)
        .select(
            F.array_min("days").alias("first_us"),
            F.explode("days").alias("day_us"),
        )
        .groupBy("day_us")
        .agg(
            F.count("*").cast("long").alias("n_active"),
            F.sum(
                F.when(F.col("day_us") == F.col("first_us"), 1).otherwise(0)
            ).cast("long").alias("n_new"),
            F.sum(
                F.when(F.col("day_us") > F.col("first_us"), 1).otherwise(0)
            ).cast("long").alias("n_returning"),
        )
    )
    want = _rowset(REGISTRY["a_new_vs_returning"].fn(spark, SF))
    assert got == want


def test_bitmap_distinct_state_across_batches(spark):
    # The bit_or word state must OR user bits arriving in DIFFERENT
    # micro-batches into the same word row — popcounts then equal the
    # batch twin's exact countDistinct.
    ev = _read_stream(spark, _trickle_src(spark)[0])
    words = ev.groupBy(
        "event_type", F.expr("user_id div 32").alias("word")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(1L, cast(user_id % 32 as int))")
        ).alias("m")
    )
    name, n_batches = _run_to_memory(words, "complete")
    assert n_batches == 3
    got = _rowset(
        spark.table(name)
        .groupBy("event_type")
        .agg(
            F.sum(F.bit_count("m")).cast("long").alias("n_users_bitmap"),
            F.count("*").cast("long").alias("n_words"),
        )
    )
    want = _rowset(
        REGISTRY["b_agg_bitmap_distinct"]
        .fn(spark, SF)
        .select("event_type", "n_users_bitmap", "n_words")
    )
    assert got == want


def test_burn_rate_state_across_batches(spark):
    # Hour counters spanning a batch cut must keep accumulating in
    # state; the post-processed multi-window burns then equal the
    # batch twin row-for-row.
    from pyspark.sql import Window

    ev = _read_stream(spark, _trickle_src(spark)[0])
    hourly = ev.groupBy(
        F.unix_micros(F.date_trunc("HOUR", F.col("ts"))).alias("hour_us")
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("err"),
        F.count("*").alias("tot"),
    )
    name, n_batches = _run_to_memory(hourly, "complete")
    assert n_batches == 3
    grid = spark.table(name).withColumn(
        "hour_idx", (F.col("hour_us") / F.lit(3600000000)).cast("long")
    )
    w6 = Window.orderBy("hour_idx").rangeBetween(-5, 0)
    win = grid.select(
        "hour_us",
        "err",
        "tot",
        F.sum("err").over(w6).alias("err6"),
        F.sum("tot").over(w6).alias("tot6"),
    )
    sb = F.col("err") * 4.0 / F.col("tot")
    lb = F.col("err6") * 4.0 / F.col("tot6")
    got = _rowset(
        win.filter((sb > 1.2) & (lb > 1.2)).select(
            "hour_us",
            F.col("err").cast("long").alias("err"),
            F.col("tot").cast("long").alias("tot"),
            F.col("err6").cast("long").alias("err6"),
            F.col("tot6").cast("long").alias("tot6"),
            rnd(sb, 4).alias("short_burn"),
            rnd(lb, 4).alias("long_burn"),
        )
    )
    want = _rowset(REGISTRY["a_sli_burn_rate"].fn(spark, SF))
    assert got == want
