"""Observation API (df.observe): per-query data-quality counters
collected as accumulator-style metrics during the SAME pass as the
real work — at 100 TB this replaces a second validation scan, which is
why production pipelines attach row-count/null-count/domain checks
this way."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from demo_segmenter_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_observe_quality_counters_single_pass(spark):
    obs = Observation("events_quality")
    ev = load_table(spark, SF_SMOKE, "events").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("null_values"),
        F.sum((F.col("value") < 0).cast("long")).alias("negative_values"),
        # DISTINCT aggregates are rejected in observed metrics
        # (they'd need a shuffle); the HLL sketch is the production
        # pattern — exact on 15 keys.
        F.approx_count_distinct("user_id").alias("n_users"),
    )
    # The "real" job: daily per-type counts.
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("d"), "event_type")
        .count()
        .collect()
    )
    assert sum(r["count"] for r in daily) == 1000
    m = obs.get
    assert m["n_rows"] == 1000
    assert m["null_values"] == 0
    assert m["negative_values"] == 0
    assert m["n_users"] == 15  # TESTDATA.md: 15 users at sf0.001
