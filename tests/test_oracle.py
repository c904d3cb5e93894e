"""Local mirror of the driver's DuckDB-oracle correctness gate
(__spark_entry__.py docstring): for every registered query with an
oracle, run the Spark DataFrame and the DuckDB SQL on sf0.001 and
compare row count, column names, and values order-insensitively.

Floats are compared exactly after the queries' own rounding, with a
tiny absolute tolerance only to flag genuine logic errors rather than
last-ulp noise; the real gate is the driver's hash at sf0.01.
"""

from __future__ import annotations

import math

import pytest

from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


def _normalize(rows, columns):
    """Sort columns by name, then rows; stringify with float rounding."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.6f}")
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [columns[i] for i in order], out


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(name, spark, ddb):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_SMOKE)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    cur = ddb.execute(spec.oracle)
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    _, s_norm = _normalize(s_rows, s_cols)
    _, d_norm = _normalize(d_rows, d_cols)
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(name, spark):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_SMOKE)
    assert sdf.count() >= 0
