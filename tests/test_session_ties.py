"""Exact-gap tie semantics across sessionization implementations.

ADVICE (round 1) flagged a suspected divergence: session_window's
interval is nominally half-open [start, last+gap), which would make an
event at exactly prev_ts+GAP start a NEW session while the lag/cumsum
rewrite (`diff > GAP_US` = new session) keeps it in the SAME one.

Empirically (and pinned here) Spark's session MERGE is inclusive at
the boundary: gap "8 hours" with diff == exactly 8h yields ONE
session, diff == 8h+1µs yields TWO. That is identical to the
lag/cumsum predicate and the PAPI state machine (`us - last_us >
GAP_US` starts a session). So all implementations already share
exact-tie behavior; this test exists to fail loudly if a Spark
upgrade ever changes the boundary rule.
"""

from __future__ import annotations

import datetime

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from demo_segmenter_spark.operators.layer_a import GAP_INTERVAL, GAP_US
from demo_segmenter_spark.streaming.papi import _assign_sessions


class _FakeState:
    """Minimal GroupState stand-in for driving _assign_sessions."""

    exists = False

    def get(self):  # pragma: no cover - not reached when exists=False
        raise ValueError

    def update(self, v):
        self.value = v


BASE = datetime.datetime(2024, 1, 1)


def _events(spark, diffs_us):
    """One user, events at cumulative offsets [0, *diffs_us]."""
    rows, t = [(1, 0, BASE)], 0
    for i, d in enumerate(diffs_us):
        t += d
        rows.append((1, i + 1, BASE + datetime.timedelta(microseconds=t)))
    return spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")


def _native_counts(spark, diffs_us):
    ev = _events(spark, diffs_us)
    out = (
        ev.groupBy(F.session_window("ts", GAP_INTERVAL).alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    return sorted(r.n for r in out)


def _lag_cumsum_counts(spark, diffs_us):
    ev = _events(spark, diffs_us)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    is_new = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > GAP_US), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (
        ev.withColumn("sid", F.sum(is_new).over(run))
        .groupBy("user_id", "sid")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    return sorted(r.n for r in out)


def _papi_counts(diffs_us):
    ts, t = [0], 0
    for d in diffs_us:
        t += d
        ts.append(t)
    pdf = pd.DataFrame(
        {"user_id": 1, "event_id": range(len(ts)), "ts_us": ts}
    )
    state = _FakeState()
    (out,) = list(_assign_sessions((1,), iter([pdf]), state))
    return sorted(out.groupby("session_id").size().tolist())


CASES = [
    # (diffs between consecutive events, expected session sizes)
    ([GAP_US], [2]),          # exact-gap tie -> SAME session
    ([GAP_US + 1], [1, 1]),   # 1µs past the gap -> split
    ([GAP_US - 1], [2]),
    ([GAP_US, GAP_US], [3]),  # chained exact ties keep extending
    ([GAP_US, GAP_US + 1], [1, 2]),
]


def test_native_session_window_tie_inclusive(spark):
    for diffs, expect in CASES:
        assert _native_counts(spark, diffs) == expect, diffs


def test_lag_cumsum_matches_native_on_ties(spark):
    for diffs, expect in CASES:
        assert _lag_cumsum_counts(spark, diffs) == expect, diffs


def test_papi_state_machine_matches_on_ties():
    for diffs, expect in CASES:
        assert _papi_counts(diffs) == expect, diffs


def test_dynamic_gap_boundary_and_running_max(spark):
    # Dynamic-gap session_window (a_session_dynamic_gap's form): pin
    # (1) the inclusive exact-boundary merge, (2) the interval-UNION
    # running-max rule: a short-gap event cannot shrink a horizon an
    # earlier long-gap event already established.
    import datetime

    B = datetime.datetime(2024, 1, 1)
    us = datetime.timedelta(microseconds=1)
    gap = (
        F.when(F.col("event_type") == "error", F.lit("30 minutes"))
        .otherwise(F.lit("8 hours"))
    )

    def counts(rows):
        ev = spark.createDataFrame(
            rows, "user_id int, event_type string, ts timestamp"
        )
        out = (
            ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        return sorted(r.n for r in out)

    H8 = datetime.timedelta(hours=8)
    M30 = datetime.timedelta(minutes=30)
    # exact dynamic boundary merges (inclusive), +1us splits
    assert counts([(1, "error", B), (1, "view", B + M30)]) == [2]
    assert counts([(1, "error", B), (1, "view", B + M30 + us)]) == [1, 1]
    # running max: view@B opens an 8h horizon; an error 1h later has a
    # 30min gap, but the view's horizon still carries an event at 5h
    assert counts(
        [
            (1, "view", B),
            (1, "error", B + datetime.timedelta(hours=1)),
            (1, "view", B + datetime.timedelta(hours=5)),
        ]
    ) == [3]
    # ...and exactly past the 8h horizon splits
    assert counts(
        [
            (1, "view", B),
            (1, "error", B + datetime.timedelta(hours=1)),
            (1, "view", B + H8 + us),
        ]
    ) == [1, 2]
