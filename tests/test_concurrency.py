"""Concurrent query serving on one SparkSession: an analytics engine
is multi-tenant — several queries submitted from different threads must
plan and execute correctly in parallel (Spark's scheduler interleaves
jobs; results must be identical to serial execution). Exercises the
thread-safety of the registry fns + shared session the way a BI layer
or notebook gateway would."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()

NAMES = ["a_sessionize", "b_agg_basic", "b_multiway_star", "c_dedup_exact",
         "a_funnel", "b_agg_histogram"]


def test_parallel_queries_match_serial(spark):
    serial = {n: REGISTRY[n].fn(spark, SF_SMOKE).count() for n in NAMES}

    def run(n):
        return n, REGISTRY[n].fn(spark, SF_SMOKE).count()

    with ThreadPoolExecutor(max_workers=len(NAMES)) as pool:
        parallel = dict(pool.map(run, NAMES))
    assert parallel == serial
