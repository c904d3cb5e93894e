"""Skew mitigation for big-big joins (SURVEY.md §4; 100 TB design).

AQE's skew-join splitting handles most cases at runtime
(`spark.sql.adaptive.skewJoin.enabled`, on by default with our session
factory); this module is the *explicit* salting pattern for the cases
AQE can't fix — e.g. a single hot key on BOTH sides, or a stateful
aggregation keyed by a hot user.

`salted_join` replicates the right side `salt` times and scatters the
left side across the salt space, so one hot key spreads over `salt`
tasks. Result is row-identical to the unsalted join (asserted in
tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join on `on` with the left side's hot keys scattered over
    `salt` buckets and the right side replicated `salt` times.

    Use when both sides are too big to broadcast and one key dominates:
    shuffle becomes (key, salt_bucket) so a hot key occupies `salt`
    tasks instead of one.
    """
    left_salted = left.withColumn(
        SALT_COL, (F.rand(seed=42) * salt).cast("int")
    )
    right_salted = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return left_salted.join(right_salted, [on, SALT_COL], how).drop(SALT_COL)
