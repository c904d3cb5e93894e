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
    HOLT_OUTPUT_SCHEMA,
    HOLT_STATE_SCHEMA,
    _holt_smooth,
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


# ---------------------------------------------------------------------------
# Round-8 (verdict ask #6): the adversarial harness, parametrized over
# EVERY GroupState processor in streaming/papi.py. A/B run: the SAME
# processor over (A) the ascending single-file source at the default
# Arrow batch size and (B) the descending single-file source split into
# 7-row chunks. A is the in-order replay the registered queries certify
# against their oracles; B is the worst-case chunk order — equality
# proves chunk-split safety for every processor, and the introspection
# test below makes it impossible to add a processor without covering it.
# ---------------------------------------------------------------------------

from demo_segmenter_spark.streaming.papi import (  # noqa: E402
    ABSENCE_OUTPUT_SCHEMA,
    CAPPED_OUTPUT_SCHEMA,
    CAPPED_STATE_SCHEMA,
    ABSENCE_STATE_SCHEMA,
    ALERT_OUTPUT_SCHEMA,
    ALERT_STATE_SCHEMA,
    ATTR_OUTPUT_SCHEMA,
    ATTR_STATE_SCHEMA,
    CEP_OUTPUT_SCHEMA,
    CEP_STATE_SCHEMA,
    FUNNEL_OUTPUT_SCHEMA,
    FUNNEL_STATE_SCHEMA,
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
    THROTTLE_OUTPUT_SCHEMA,
    THROTTLE_STATE_SCHEMA,
    _absence_gaps,
    _advance_funnel,
    _capped_sessions,
    _alert_hysteresis,
    _assign_sessions,
    _attribution,
    _cep_pattern,
    _throttle_final,
)

_GRACE_SEC = SESSION_GRACE_US // 1_000_000


def _US():
    # column construction needs an active session — build lazily
    return F.unix_micros("ts").alias("ts_us")


def _p_sessionize(df):
    return df.select("user_id", "event_id", _US())


def _p_funnel(df):
    return df.select("user_id", "event_id", "event_type", _US())


def _p_ewma(df):
    return df.select("user_id", "event_id", _US(), "value")


def _p_session_final(df):
    return df.withWatermark("ts", f"{_GRACE_SEC} seconds").select(
        "user_id", "event_id", "ts", _US(), cents_expr(F.col("value")).alias("cents")
    )


def _p_throttle(df):
    return df.withWatermark("ts", "0 seconds").select(
        "user_id", "event_id", _US(), "ts"
    )


def _p_capped(df):
    return df.select("user_id", "event_id", _US())


def _p_alert(df):
    return df.select("user_id", "event_id", _US(), "value")


def _p_absence(df):
    return df.select("user_id", "event_id", _US())


def _p_attribution(df):
    return df.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "event_id",
        _US(),
        F.when(F.col("event_type") == "view", 0).otherwise(1).alias("kind"),
    )


def _p_cep(df):
    return df.filter(
        F.col("event_type").isin("view", "error", "purchase")
    ).select(
        "user_id",
        "event_id",
        _US(),
        F.when(F.col("event_type") == "view", 0)
        .when(F.col("event_type") == "error", 1)
        .otherwise(2)
        .alias("kind"),
    )


PROCESSORS = {
    "sessionize": (_assign_sessions, OUTPUT_SCHEMA, STATE_SCHEMA, "update", "NoTimeout", _p_sessionize),
    "funnel": (_advance_funnel, FUNNEL_OUTPUT_SCHEMA, FUNNEL_STATE_SCHEMA, "update", "NoTimeout", _p_funnel),
    "ewma": (_smooth_ewma, EWMA_OUTPUT_SCHEMA, EWMA_STATE_SCHEMA, "update", "NoTimeout", _p_ewma),
    "session_final": (_session_final, SESSION_FINAL_OUTPUT_SCHEMA, SESSION_FINAL_STATE_SCHEMA, "append", "EventTimeTimeout", _p_session_final),
    "throttle": (_throttle_final, THROTTLE_OUTPUT_SCHEMA, THROTTLE_STATE_SCHEMA, "append", "EventTimeTimeout", _p_throttle),
    "session_capped": (_capped_sessions, CAPPED_OUTPUT_SCHEMA, CAPPED_STATE_SCHEMA, "update", "NoTimeout", _p_capped),
    "alert_hysteresis": (_alert_hysteresis, ALERT_OUTPUT_SCHEMA, ALERT_STATE_SCHEMA, "update", "NoTimeout", _p_alert),
    "absence_gaps": (_absence_gaps, ABSENCE_OUTPUT_SCHEMA, ABSENCE_STATE_SCHEMA, "update", "NoTimeout", _p_absence),
    "attribution": (_attribution, ATTR_OUTPUT_SCHEMA, ATTR_STATE_SCHEMA, "update", "NoTimeout", _p_attribution),
    "cep_pattern": (_cep_pattern, CEP_OUTPUT_SCHEMA, CEP_STATE_SCHEMA, "update", "NoTimeout", _p_cep),
    "holt": (_holt_smooth, HOLT_OUTPUT_SCHEMA, HOLT_STATE_SCHEMA, "update", "NoTimeout", _p_ewma),
}


def test_every_papi_processor_is_covered():
    # Introspection gate: any new (key, pdfs, state) processor added to
    # streaming/papi.py fails here until it joins PROCESSORS above.
    import inspect

    from demo_segmenter_spark.streaming import papi

    procs = set()
    for nm, fn in vars(papi).items():
        if inspect.isfunction(fn) and fn.__module__ == papi.__name__:
            params = list(inspect.signature(fn).parameters)
            if len(params) == 3 and params[-1] == "state":
                procs.add(nm)
    covered = {cfg[0].__name__ for cfg in PROCESSORS.values()}
    assert procs == covered, (sorted(procs - covered), sorted(covered - procs))


@pytest.fixture()
def ab_sources(spark):
    """(ascending, descending) single-file sources over the same rows:
    one micro-batch each; chunk order is the ONLY difference."""
    base = f"/tmp/dss_stream_mb/absrc_{uuid.uuid4().hex[:8]}"
    shutil.rmtree(base, ignore_errors=True)
    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ev.orderBy("ts", "event_id").coalesce(1).write.parquet(f"{base}/asc")
    ev.orderBy(F.desc("ts"), F.desc("event_id")).coalesce(1).write.parquet(
        f"{base}/desc"
    )
    try:
        yield f"{base}/asc", f"{base}/desc"
    finally:
        shutil.rmtree(base, ignore_errors=True)


@pytest.mark.parametrize("name", sorted(PROCESSORS))
def test_processor_is_chunk_order_invariant(spark, ab_sources, name):
    from pyspark.sql.streaming.state import GroupStateTimeout

    fn, out_schema, st_schema, mode, timeout, project = PROCESSORS[name]
    asc, desc = ab_sources
    results = []
    old = spark.conf.get(_BATCH_KEY)
    try:
        for src, batch_rows in ((asc, old), (desc, "7")):
            spark.conf.set(_BATCH_KEY, batch_rows)
            ev = project(_read(spark, src))
            out = ev.groupBy("user_id").applyInPandasWithState(
                fn,
                outputStructType=out_schema,
                stateStructType=st_schema,
                outputMode=mode,
                timeoutConf=getattr(GroupStateTimeout, timeout),
            )
            tbl, _ = _run_to_memory(out, mode)
            results.append(
                {tuple(r) for r in spark.table(tbl).collect()}
            )
    finally:
        spark.conf.set(_BATCH_KEY, old)
    got_asc, got_desc = results
    assert len(got_asc) > 0
    assert got_asc == got_desc, (
        name,
        len(got_asc),
        len(got_desc),
        sorted(got_asc ^ got_desc)[:3],
    )
