"""Degenerate-window drift cases (round-11, ADVICE r10): an event
type observed in only ONE of the two midpoint windows — the canonical
brand-new-event-type drift — must produce a DEFINED, engine-agreeing
result, not 0/0 NaN (Spark null) vs a DuckDB CAST(round(nan)) error.

a_drift_ks  -> ks = 1.0 (maximal drift: sup|F_ref − F_cur| as the
               absent window's mass vanishes).
a_drift_chi2 -> the zero-count window contributes a guarded 0 term
               (expected frequency identically 0), mirroring PSI's
               absent-bin smoothing.

The standard fixture never reaches this (every type spans both
halves), so this test crafts the events table directly and runs BOTH
the registered Spark query and its DuckDB oracle on it.
"""

from __future__ import annotations

import datetime as dt
import math
import shutil
import uuid

import duckdb
import pytest

from demo_segmenter_spark.registry import REGISTRY, load_all_operators

load_all_operators()

T0 = dt.datetime(2024, 3, 1)


@pytest.fixture()
def degen_dir(spark):
    # midpoint of [0, 110] minutes = 55: "steady" spans both windows,
    # "newcomer" exists ONLY in the current (second) window.
    rows = [
        (0, T0 + dt.timedelta(minutes=0), 1, "steady", 1.0, "{}"),
        (1, T0 + dt.timedelta(minutes=10), 1, "steady", 2.0, "{}"),
        (2, T0 + dt.timedelta(minutes=60), 2, "steady", 1.5, "{}"),
        (3, T0 + dt.timedelta(minutes=70), 2, "steady", 2.5, "{}"),
        (4, T0 + dt.timedelta(minutes=100), 3, "newcomer", 9.0, "{}"),
        (5, T0 + dt.timedelta(minutes=110), 3, "newcomer", 11.0, "{}"),
    ]
    d = f"/tmp/dss_degen/{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(f"{d}/events.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _oracle_rows(oracle_sql, d):
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM"
            f" read_parquet('{d}/events.parquet/*.parquet')"
        )
        cur = con.execute(oracle_sql)
        cols = [c[0] for c in cur.description]
        return cols, cur.fetchall()
    finally:
        con.close()


def _agree(spec, spark, d):
    sdf = spec.fn(spark, d)
    s_cols = sdf.columns
    s_rows = {tuple(r)[0]: dict(zip(s_cols, tuple(r))) for r in sdf.collect()}
    d_cols, d_raw = _oracle_rows(spec.oracle, d)
    d_rows = {r[0]: dict(zip(d_cols, r)) for r in d_raw}
    assert sorted(s_cols) == sorted(d_cols)
    assert s_rows.keys() == d_rows.keys()
    for k in s_rows:
        for c in s_cols:
            sv, dv = s_rows[k][c], d_rows[k][c]
            if isinstance(sv, float):
                assert dv is not None and not math.isnan(sv), (k, c, sv, dv)
                assert abs(sv - float(dv)) < 1e-9, (k, c, sv, dv)
            else:
                assert sv == dv, (k, c, sv, dv)
    return s_rows


def test_ks_one_sided_window_is_defined_maximal(spark, degen_dir):
    rows = _agree(REGISTRY["a_drift_ks"], spark, degen_dir)
    nc = rows["newcomer"]
    assert nc["n_ref"] == 0 and nc["n_cur"] == 2
    assert nc["ks"] == pytest.approx(1.0)
    # the two-sided type still gets the ordinary exact statistic
    st = rows["steady"]
    assert st["n_ref"] == 2 and st["n_cur"] == 2
    assert 0.0 <= st["ks"] <= 1.0 and not math.isnan(st["ks"])


def test_chi2_one_sided_window_is_defined(spark, degen_dir):
    rows = _agree(REGISTRY["a_drift_chi2"], spark, degen_dir)
    nc = rows["newcomer"]
    assert nc["n_ref"] == 0 and nc["n_cur"] == 2
    # with n0 = 0: o0 = 0 per bin, so the o1 cross-difference
    # o1·n − n1·(o0+o1) = 0 too — chi2 collapses to exactly 0, the
    # guarded finite value (drift detection for this case reads the
    # n_ref = 0 column, as PSI's smoothing does).
    assert nc["chi2"] == pytest.approx(0.0)
    st = rows["steady"]
    assert st["chi2"] is not None and not math.isnan(st["chi2"])


def test_ks_binned_le_exact_and_stream_twin(spark):
    # Relational pin: the binned sup is the exact sup restricted to a
    # coarser evaluation set, so binned <= exact per type (fixture),
    # and the degenerate one-sided window still reads 1.0 in both.
    from tests.conftest import SF_SMOKE

    exact = {
        r["event_type"]: r["ks"]
        for r in REGISTRY["a_drift_ks"].fn(spark, SF_SMOKE).collect()
    }
    binned_rows = REGISTRY["a_drift_ks_binned"].fn(spark, SF_SMOKE).collect()
    assert binned_rows and set(exact) == {r["event_type"] for r in binned_rows}
    for r in binned_rows:
        assert r["ks_binned"] <= exact[r["event_type"]] + 1e-9, r
        assert 0.0 <= r["ks_binned"] <= 1.0
    got = {
        tuple(r)
        for r in REGISTRY["a_drift_ks_binned_stream"].fn(spark, SF_SMOKE).collect()
    }
    assert got == {tuple(r) for r in binned_rows}


def test_ks_binned_degenerate_window(spark, degen_dir):
    rows = _agree(REGISTRY["a_drift_ks_binned"], spark, degen_dir)
    assert rows["newcomer"]["ks_binned"] == pytest.approx(1.0)
    assert rows["steady"]["ks_binned"] is not None
