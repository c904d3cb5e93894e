"""Property-based third implementations for the round-7 monitor /
gap-fill operators (SURVEY.md §5.4 idiom): on arbitrary tiny event
tables, the REGISTERED queries (run end-to-end against a crafted
events.parquet) must agree with independent pure-Python references.
Edge cases the fixture can't reach: equal timestamps inside one
(user, hour) quota window (event_id tiebreak), values exactly on the
hysteresis thresholds, users whose whole span is one day (no interp
rows), gaps anchored at the first event."""

from __future__ import annotations

import datetime as dt
import shutil
import uuid

from hypothesis import given, settings
from hypothesis import strategies as st

from demo_segmenter_spark.registry import REGISTRY, load_all_operators

load_all_operators()

T0 = dt.datetime(2024, 3, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # user_id
        st.integers(min_value=0, max_value=500),    # minutes from T0
        st.integers(min_value=0, max_value=1300),   # value deci-units
    ),
    min_size=1,
    max_size=25,
)


def _mk_events(spark, raw):
    """raw (user, minutes, decivalue) -> events.parquet in a tmp sf dir
    (event_id = list index: the unique tiebreak)."""
    rows = [
        (i, T0 + dt.timedelta(minutes=m), u, "view", v / 10.0, "{}")
        for i, (u, m, v) in enumerate(raw)
    ]
    d = f"/tmp/dss_prop/{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(f"{d}/events.parquet")
    return d


def _cleanup(d):
    shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=8, deadline=None)
@given(events_strategy)
def test_throttle_matches_reference(spark, raw):
    d = _mk_events(spark, raw)
    try:
        got = {
            (r.user_id, r.hour_us): (r.n_events, r.n_kept, r.n_dropped)
            for r in REGISTRY["a_throttle"].fn(spark, d).collect()
        }
    finally:
        _cleanup(d)
    want: dict = {}
    order = sorted(
        (u, T0 + dt.timedelta(minutes=m), i) for i, (u, m, _) in enumerate(raw)
    )
    for u, ts, _ in order:
        h = ts.replace(minute=0, second=0, microsecond=0)
        key = (u, int(h.timestamp() * 1_000_000))
        n, k, dr = want.get(key, (0, 0, 0))
        n += 1
        if n <= 3:
            k += 1
        else:
            dr += 1
        want[key] = (n, k, dr)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(events_strategy)
def test_alert_hysteresis_matches_reference(spark, raw):
    d = _mk_events(spark, raw)
    try:
        got = {
            (r.user_id, r.event_id): r.alert_on
            for r in REGISTRY["a_alert_hysteresis"].fn(spark, d).collect()
        }
    finally:
        _cleanup(d)
    want = {}
    state: dict = {}
    order = sorted(
        (u, T0 + dt.timedelta(minutes=m), i, v / 10.0)
        for i, (u, m, v) in enumerate(raw)
    )
    for u, _, i, val in order:
        cur = state.get(u, 0)
        nxt = 1 if val >= 100.0 else (0 if val < 20.0 else cur)
        if nxt != cur:
            want[(u, i)] = nxt
        state[u] = nxt
    assert got == want


@settings(max_examples=8, deadline=None)
@given(events_strategy)
def test_gapfill_interp_matches_reference(spark, raw):
    d = _mk_events(spark, raw)
    try:
        got = {
            (r.user_id, r.day): (r.value, r.kind)
            for r in REGISTRY["a_gapfill_interp"].fn(spark, d).collect()
        }
    finally:
        _cleanup(d)
    daily: dict = {}
    for i, (u, m, v) in enumerate(raw):
        day = (T0 + dt.timedelta(minutes=m)).date()
        daily[(u, day)] = daily.get((u, day), 0) + round(v / 10.0 * 100 + 1e-4)
    lo = min(day for _, day in daily)
    hi = max(day for _, day in daily)
    users = {u for u, _ in daily}
    want = {}
    for u in users:
        obs = sorted(day for uu, day in daily if uu == u)
        dcur = lo
        while dcur <= hi:
            key = (u, str(dcur))
            if (u, dcur) in daily:
                want[key] = (
                    round(daily[(u, dcur)] / 100.0 + 1e-6, 2) + 0.0,
                    "obs",
                )
            else:
                prev = max((o for o in obs if o < dcur), default=None)
                nxt = min((o for o in obs if o > dcur), default=None)
                if prev is not None and nxt is not None:
                    pc, nc = daily[(u, prev)], daily[(u, nxt)]
                    k = (dcur - prev).days
                    n = (nxt - prev).days
                    val = round((pc + (nc - pc) * k * 1.0 / n) / 100.0 + 1e-6, 2) + 0.0
                    want[key] = (val, "interp")
                else:
                    want[key] = (None, "edge")
            dcur += dt.timedelta(days=1)
    assert got == want


def test_chi2_python_third_implementation(spark):
    # pure-python replay of the chi-squared drift test from the raw
    # fixture (duckdb only for the scan): same midpoint split, same
    # binning, same nano-quantized terms — and the null sanity that
    # statistically-identical halves score chi2 in the df ballpark
    import duckdb

    from demo_segmenter_spark.operators.layer_a import PSI_BIN_W, PSI_BINS
    from demo_segmenter_spark.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = duckdb.sql(
        "SELECT event_type, epoch_us(ts), value FROM"
        f" read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    lo = min(r[1] for r in rows)
    hi = max(r[1] for r in rows)
    mid = (lo + hi) // 2
    cnt: dict = {}
    for t, us, v in rows:
        w = 0 if us < mid else 1
        b = min(int(v // PSI_BIN_W), PSI_BINS - 1)
        cnt[(t, b, w)] = cnt.get((t, b, w), 0) + 1
    want = {}
    for t in {r[0] for r in rows}:
        bins = sorted({b for (tt, b, _w) in cnt if tt == t})
        n0 = sum(cnt.get((t, b, 0), 0) for b in bins)
        n1 = sum(cnt.get((t, b, 1), 0) for b in bins)
        n = n0 + n1
        nano = 0
        for b in bins:
            o0, o1 = cnt.get((t, b, 0), 0), cnt.get((t, b, 1), 0)
            tb = o0 + o1
            for o, nw in ((o0, n0), (o1, n1)):
                d = float(o * n - nw * tb)
                nano += round(d * d / (float(n) * nw * tb) * 1e9 + 1e-4)
        want[t] = (n0, n1, len(bins) - 1, round(nano / 1e9 + 1e-10, 6) + 0.0)
    got = {
        r["event_type"]: (r["n_ref"], r["n_cur"], r["df"], r["chi2"])
        for r in REGISTRY["a_drift_chi2"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want
    for n0, n1, df, chi2 in got.values():
        assert 0 < chi2 < 5 * max(df, 1)  # null band on identical halves
