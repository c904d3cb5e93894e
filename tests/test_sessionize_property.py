"""Property-based sessionization check (SURVEY.md §5.4): on arbitrary
event sets, the Spark lag/cumsum window rewrite must agree with an
independent pure-Python state machine. Catches boundary/tie bugs the
fixture data can't reach (duplicate timestamps, single-event users,
events exactly at the gap)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from demo_segmenter_spark.operators.layer_a import GAP_US

UTC = dt.timezone.utc
T0 = dt.datetime(2024, 1, 1, tzinfo=UTC)

# offsets in hours around the 8h gap, including exact-gap ties and dups
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user_id
        st.integers(min_value=0, max_value=40),  # hour offset
    ),
    min_size=1,
    max_size=25,
)


def _reference(rows):
    """Independent implementation: sort per user by (ts, event_id),
    bump session when gap > GAP_US (inclusive-gap semantics)."""
    out = {}
    by_user: dict[int, list] = {}
    for user, ts_us, eid in rows:
        by_user.setdefault(user, []).append((ts_us, eid))
    for user, evs in by_user.items():
        evs.sort()
        last, sid = None, 0
        for ts_us, eid in evs:
            if last is None or ts_us - last > GAP_US:
                sid += 1
            last = ts_us
            out[(user, eid)] = sid
    return out


@settings(max_examples=12, deadline=None)
@given(events_strategy)
def test_sessionize_matches_reference(spark, raw):
    rows = [
        (user, T0 + dt.timedelta(hours=off), eid)
        for eid, (user, off) in enumerate(raw)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | ((us - prev) > GAP_US), 1).otherwise(0)
    got = {
        (r.user_id, r.event_id): r.session_id
        for r in df.withColumn(
            "session_id",
            F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        ).collect()
    }
    ref_rows = [
        (user, int(ts.timestamp() * 1_000_000), eid) for user, ts, eid in rows
    ]
    assert got == _reference(ref_rows)
