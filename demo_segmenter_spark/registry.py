"""Query registry: the single source of truth wiring SURVEY.md §2's
operator inventory to the driver contract in ``__spark_entry__.py``.

Each operator registers a callable ``(spark, sf_dir) -> DataFrame`` and,
when SQL-expressible, a DuckDB oracle string over the pre-registered
views (region nation customer supplier part orders lineitem events
documents embeddings). Ops without an oracle get the driver's weaker
rows-only check (__spark_entry__.py docstring).

Discipline enforced here by convention (SURVEY.md §5):
- every computed column is aliased identically in Spark and oracle SQL;
- float aggregates are rounded (2dp) on BOTH sides;
- raw timestamps in outputs are converted to epoch microseconds
  (Spark ``unix_micros`` == DuckDB ``epoch_us``) so ns/µs precision and
  rendering differences can't break the value hash;
- every row_number/limit has a unique-key total-order tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register an operator under its SURVEY.md §2 Q-name."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def load_all_operators() -> None:
    """Import every operator module so decorators populate REGISTRY."""
    from demo_segmenter_spark.operators import layer_a, layer_b, layer_c  # noqa: F401
