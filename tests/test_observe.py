"""Pipeline observability: df.observe() metric collection on the batch
and streaming sessionization paths. Production jobs attach named
aggregate observations for row-count / value-sum telemetry; the metrics
must be exact (they ride the same execution, not a sample), and on
streams they must accumulate per micro-batch via the query progress —
the monitoring surface any engine deployment wires to its alerting.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Observation
from pyspark.sql import functions as F

from demo_segmenter_spark.functions.compat import cents
from demo_segmenter_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_batch_observe_metrics_are_exact(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    obs = Observation("ingest")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents(F.col("value"))).alias("sum_cents"),
        # DISTINCT aggregates are rejected in observed metrics
        # (INVALID_OBSERVED_METRICS); the sketch form is the supported
        # cardinality telemetry
        F.approx_count_distinct(F.col("user_id")).alias("n_users_approx"),
    )
    out = observed.groupBy("event_type").count().collect()
    want = ev.agg(
        F.count(F.lit(1)),
        F.sum(cents(F.col("value"))),
        F.count_distinct(F.col("user_id")),
    ).first()
    got = obs.get
    assert got["n_rows"] == want[0]
    assert got["sum_cents"] == want[1]
    assert abs(got["n_users_approx"] - want[2]) <= 0.05 * want[2]
    assert sum(r["count"] for r in out) == got["n_rows"]


def test_streaming_observe_accumulates_across_batches(spark):
    from tests.test_stream_multibatch import _read_stream, _trickle_src

    src, n, _ = _trickle_src(spark)
    ev = _read_stream(spark, src).observe(
        "wire",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents(F.col("value"))).alias("sum_cents"),
    )
    name = f"obs_{uuid.uuid4().hex[:8]}"
    q = (
        ev.select("event_id")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    per_batch = [
        p["observedMetrics"]["wire"]
        for p in q.recentProgress
        if "wire" in p.get("observedMetrics", {})
    ]
    assert len(per_batch) == 3, f"expected 3 observed batches, saw {len(per_batch)}"
    assert sum(m["n_rows"] for m in per_batch) == n
    want = (
        load_table(spark, "/root/testdata/sf0.01", "events")
        .agg(F.sum(cents(F.col("value"))))
        .first()[0]
    )
    assert sum(m["sum_cents"] for m in per_batch) == want
