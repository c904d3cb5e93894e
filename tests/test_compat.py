"""Cross-engine rounding compatibility (functions/compat.py): the
measured Spark-vs-DuckDB round() divergence and its fix."""

from __future__ import annotations

import duckdb

from demo_segmenter_spark.functions.compat import EPS, sql_rnd


def test_engines_disagree_without_nudge(spark, ddb):
    """Documents the raw divergence: same double, different round()."""
    v = "CAST(2348.325 AS DOUBLE)"  # binary value is ...3249999999998
    s = spark.sql(f"SELECT round({v}, 2) AS r").collect()[0].r
    d = ddb.execute(f"SELECT round({v}, 2)").fetchone()[0]
    assert s == 2348.33 and d == 2348.32  # the trap compat.py defuses


def test_nudged_round_agrees(spark, ddb):
    for raw in ["2348.325", "52724.245", "6812.395", "0.125", "-2348.325", "17.0"]:
        expr = sql_rnd(f"CAST({raw} AS DOUBLE)", 2)
        s = spark.sql(f"SELECT {expr} AS r").collect()[0].r
        d = ddb.execute(f"SELECT {expr} AS r").fetchone()[0]
        assert s == d, (raw, s, d)


def test_eps_scales():
    assert EPS[2] == 1e-6 and EPS[4] == 1e-8
    con = duckdb.connect()
    # nudge must never change a clean value
    assert con.execute(f"SELECT round(100.0 + {EPS[2]}, 2)").fetchone()[0] == 100.0
