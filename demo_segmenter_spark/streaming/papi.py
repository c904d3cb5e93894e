"""PAPI-style custom stateful processor (SURVEY.md §2 Layer A, the
"Stateful processor" row): the Kafka Streams Processor API equivalent —
arbitrary per-key state with explicit update logic — via
``applyInPandasWithState`` (GroupState + Arrow batches).

(Spark 4 also offers ``transformWithStateInPandas``; it needs the
protobuf python package for its state-server protocol, which is broken
in this container — ImportError on google.protobuf.descriptor — so the
GroupState API is the deliberate choice here. Same state semantics.)

The processor re-implements gap sessionization imperatively (per-user
state = last-seen timestamp + session counter) to prove the custom-state
path produces identical results to both the declarative batch rewrite
and the native session_window twin — asserted by the driver's oracle
and tests. In production this is the escape hatch for semantics
session_window can't express (punctuation-driven emits, cross-window
state machines).

Scale notes: state is partitioned by the grouping key exactly like a
Kafka Streams task's RocksDB store; Arrow batches cross the Python
boundary per key-group; the state store checkpoints per micro-batch and
GroupStateTimeout handles eviction.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from demo_segmenter_spark.operators.layer_a import GAP_US
from demo_segmenter_spark.streaming.sources import stream_events

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("session_id", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("last_us", LongType()), StructField("sid", LongType())]
)


def _assign_sessions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user state machine: new session when gap > GAP_US.

    Vectorized within each Arrow batch (the same shift/cumsum core as
    the batch rewrite — a row loop here made the Python stage the
    bottleneck); only the carried (last_us, sid) state is scalar."""
    last_us, sid = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts_us", "event_id"])
        us = pdf["ts_us"].astype("int64").to_numpy()
        # prev stays int64 end-to-end: pd.Series.shift would promote to
        # float64 and lose exactness for timestamps >= 2^53 µs, so the
        # gap compare is done on an int64 concat instead, with the
        # no-prior-event case handled as an explicit first-row flag.
        prev = np.concatenate(
            (np.asarray([last_us if last_us is not None else 0], dtype="int64"), us[:-1])
        )
        is_new = (us - prev) > GAP_US
        if last_us is None:
            is_new[0] = True  # no prior event ever -> new session
        sids = sid + np.cumsum(is_new.astype("int64"))
        sid = int(sids[-1])
        last_us = int(us[-1])
        yield pd.DataFrame(
            {
                "user_id": int(key[0]),
                "event_id": pdf["event_id"].astype("int64").values,
                "ts_us": us,
                "session_id": sids,
            }
        )
    state.update((last_us, sid))


def papi_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the custom processor over the event stream to completion."""
    import uuid

    ev = stream_events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _assign_sessions,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"papi_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------------------
# Second custom processor: per-user funnel state machine (view -> click
# -> purchase). Unlike sessionization, the transition predicate is
# SEQUENTIAL (a click only counts after the first view, a purchase only
# after that click) — a shape session_window cannot express, which is
# precisely the PAPI escape hatch's job. Stage timestamps are monotone
# (set once, never overwritten), so the update-mode re-emissions across
# micro-batches resolve with a trivial max-aggregate downstream.
# Ordering contract: per-user event-time order within a batch is
# restored by the sort; across batches the file replay preserves it —
# the same per-key ordering assumption Kafka Streams makes.
# ---------------------------------------------------------------------------

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t1", LongType()),
        StructField("t2", LongType()),
        StructField("t3", LongType()),
    ]
)

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("t1", LongType()),
        StructField("t2", LongType()),
        StructField("t3", LongType()),
    ]
)


def _advance_funnel(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Vectorized per batch: in (ts, event_id) order, the sequential
    scan's 'first view' equals min(view ts), 'first click after t1'
    equals min(click ts strictly > t1), and likewise for purchase —
    the strict > reproduces the scan's tie behavior exactly (an event
    sharing t1's timestamp never advances the stage, in either
    formulation, regardless of event_id order)."""
    t1, t2, t3 = state.get if state.exists else (None, None, None)
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts_us", "event_id"])
        us = pdf["ts_us"].astype("int64")
        ty = pdf["event_type"]
        if t1 is None:
            v = us[(ty == "view").values]
            t1 = int(v.iloc[0]) if len(v) else None
        if t1 is not None and t2 is None:
            c = us[((ty == "click") & (us > t1)).values]
            t2 = int(c.iloc[0]) if len(c) else None
        if t2 is not None and t3 is None:
            p = us[((ty == "purchase") & (us > t2)).values]
            t3 = int(p.iloc[0]) if len(p) else None
    state.update((t1, t2, t3))
    yield pd.DataFrame(
        {"user_id": [int(key[0])], "t1": [t1], "t2": [t2], "t3": [t3]}
    )


def papi_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the funnel processor to completion; one (user_id, t1, t2,
    t3) row per user per micro-batch (update mode) — aggregate with
    max() downstream to resolve re-emissions."""
    import uuid

    ev = stream_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _advance_funnel,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"funnel_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------------------
# Third custom processor: per-user EWMA (operators/layer_a.py::a_ewma's
# streaming twin). Unlike the sessionize/funnel processors the output
# is PER EVENT, so update-mode re-emission never happens — each row is
# produced exactly once, in the micro-batch that carried its event —
# and the completed stream equals the batch recurrence row-for-row.
# Carried state is (last smoothed value, count): the canonical
# O(1)-state streaming feature transform.
# ---------------------------------------------------------------------------

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ewma", DoubleType()),
    ]
)

EWMA_STATE_SCHEMA = StructType(
    [StructField("y", DoubleType()), StructField("n", LongType())]
)


def _smooth_ewma(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    from demo_segmenter_spark.operators.layer_a import _ewma_rows

    y, n = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts_us", "event_id"])
        out, y, n = _ewma_rows(pdf["value"].tolist(), y, n)
        yield pd.DataFrame(
            {
                "user_id": int(key[0]),
                "event_id": pdf["event_id"].astype("int64").values,
                "ewma": out,
            }
        )
    state.update((y, n))


def papi_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the EWMA processor over the event stream to completion."""
    import uuid

    ev = stream_events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _smooth_ewma,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"ewma_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
