"""Property-based checks for the event-analytics cores (SURVEY.md §5.4
idiom, same as the sessionization property test): on arbitrary tiny
inputs, funnel_stages and locf_grid must agree with independent
pure-Python references. Reaches edge cases the fixture can't: users
with clicks before any view, stage events sharing a timestamp (the
STRICTLY-after boundary), users whose first day is after the global
grid start (leading NULLs), single-day users."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from demo_segmenter_spark.operators.layer_a import funnel_stages, locf_grid

EVENT_TYPES = ["view", "click", "purchase", "error"]

funnel_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),            # user_id
        st.sampled_from(EVENT_TYPES),                      # event_type
        st.integers(min_value=0, max_value=12),            # us (tiny clock)
    ),
    min_size=1,
    max_size=20,
)


def _funnel_reference(rows):
    # t1 = min view us; t2 = min click us STRICTLY after t1; t3 = min
    # purchase us strictly after t2 — computed order-free, like the
    # windows.
    res = {}
    users = {r[0] for r in rows}
    for u in users:
        evs = [(ty, us) for (uu, ty, us) in rows if uu == u]
        t1 = min((us for ty, us in evs if ty == "view"), default=None)
        t2 = (
            min((us for ty, us in evs if ty == "click" and t1 is not None and us > t1), default=None)
            if t1 is not None else None
        )
        t3 = (
            min((us for ty, us in evs if ty == "purchase" and t2 is not None and us > t2), default=None)
            if t2 is not None else None
        )
        res[u] = (t1, t2, t3)
    return res


@settings(max_examples=10, deadline=None)
@given(funnel_strategy)
def test_funnel_stages_match_reference(spark, raw):
    df = spark.createDataFrame(raw, "user_id long, event_type string, us long")
    got = {
        r.user_id: (r.t1, r.t2, r.t3)
        for r in funnel_stages(df).collect()
    }
    assert got == _funnel_reference(raw)


daily_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # user_id
        st.integers(min_value=0, max_value=8),   # day offset
        st.integers(min_value=-500, max_value=500),  # cents
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda r: (r[0], r[1]),
)

D0 = dt.date(2024, 3, 1)


def _locf_reference(rows):
    lo = min(r[1] for r in rows)
    hi = max(r[1] for r in rows)
    users = {r[0] for r in rows}
    have = {(u, d): c for u, d, c in rows}
    out = {}
    for u in users:
        carried = None
        for d in range(lo, hi + 1):
            if (u, d) in have:
                carried = have[(u, d)]
                filled = 0
            else:
                filled = 1
            val = None if carried is None else round(carried / 100.0, 2) + 0.0
            out[(u, str(D0 + dt.timedelta(days=d)))] = (val, filled)
    return out


@settings(max_examples=10, deadline=None)
@given(daily_strategy)
def test_locf_grid_matches_reference(spark, raw):
    rows = [(u, D0 + dt.timedelta(days=d), c) for u, d, c in raw]
    df = spark.createDataFrame(rows, "user_id long, d date, cents long")
    got = {
        (r.user_id, r.day): (r.locf_value, r.is_filled)
        for r in locf_grid(df).collect()
    }
    assert got == _locf_reference(raw)


def test_peak_concurrency_matches_brute_force(spark):
    # third implementation of the sweep line: brute-force count, per
    # distinct boundary t, of sessions with s_start <= t <= s_end
    # (inclusive overlap) — must equal the distributed two-pass sweep
    # row for row at fixture scale.
    from demo_segmenter_spark.operators.layer_a import session_aggregates
    from demo_segmenter_spark.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    sess = [
        (r.session_start_us, r.session_end_us)
        for r in session_aggregates(spark, SF_SMOKE).collect()
    ]
    ts = sorted({t for s, e in sess for t in (s, e)})
    want = {
        t: sum(1 for s, e in sess if s <= t <= e) for t in ts
    }
    got = {
        r.t_us: r.concurrency
        for r in REGISTRY["a_peak_concurrency"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want
    # the metric is non-trivial on the fixture: some overlap exists
    assert max(got.values()) > 1
