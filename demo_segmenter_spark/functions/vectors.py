"""Vector math over ``array<float>`` columns, built from JVM-side
higher-order functions (no Python UDFs in the hot path).

All arithmetic casts to double first: the parquet fixture stores
float32, and we need bit-compatible results with the DuckDB oracle,
which we also force to double (SURVEY.md §5.2 discipline).

Scale note (100 TB): these are pure Catalyst expressions, so they run
inside whole-stage codegen on executors — a 64-dim dot product is ~64
fused multiply-adds per row with zero Python round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i as a left-fold (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
