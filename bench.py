#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the `noop` sink (full computation,
no driver-side collection cost). A small warm-up query amortizes JVM/
codegen startup out of the per-query numbers, which is also how a
long-lived production session behaves.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from demo_segmenter_spark.functions.cache import release_persisted
from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from demo_segmenter_spark.session import get_spark

# Representative, scale-sensitive slice of SURVEY.md §2 across layers.
# Round 2 widened the set from 20 to 26 (the expensive families that
# were previously untimed: interval join, fuzzy dedup, retrieval +
# rerank pipelines, KPI pipeline, BM25) so regressions there are
# caught by the per-round driver bench.
HEADLINE = [
    "a_flagship_segments",
    "a_session_agg",
    "a_sessionize_stream",
    "a_tumbling_window",
    "a_pipeline_kpi",
    "a_stream_stream_join",
    "b_agg_basic",
    "b_join_inner",
    "b_multiway_star",
    "b_join_asof",
    "b_join_interval",
    "b_topk_per_group",
    "b_window_frame",
    "b_pipeline_tpch_q3",
    "c_dedup_exact",
    "c_dedup_ngram",
    "c_dedup_fuzzy",
    "c_sim_knn",
    "c_text_tfidf",
    "c_text_bm25",
    "c_doc_fingerprint",
    "c_pipeline_corpus",
    "c_pipeline_retrieval",
    "c_pipeline_rerank",
    "c_chunking",
    "c_dedup_cluster",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    load_all_operators()
    spark = get_spark(
        app_name="bench",
        cpus=cpus,
        shuffle_partitions=max(4, int(cpus)),
        driver_memory=os.environ.get("SPARK_GRAFT_MEM", "48g"),
    )

    # Warm-up: JVM, codegen, parquet footer caches.
    REGISTRY["b_agg_basic"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Best-of-N (default 2): first run pays janino codegen + stage
    # planning, later runs show steady-state throughput — the number
    # that scales to a long-lived production session (BASELINE.md
    # protocol). Set SPARK_GRAFT_BENCH_RUNS=1 for cold timings.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            # queries that persist() intermediates must not leak cache
            # into later measurements (GC pressure skews the tail)
            release_persisted()
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
