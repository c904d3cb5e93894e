#!/usr/bin/env python
"""Phase + per-micro-batch profiler for the streaming twins (guide §1:
measure first). For each named twin, runs it once warm end-to-end and
prints (a) wall phases — chunk-source write vs stream run vs tail —
and (b) Spark's own per-batch durationMs breakdown (triggerExecution,
queryPlanning, walCommit, addBatch, getBatch, commitOffsets) captured
from the StreamingQuery's recentProgress. Ad-hoc measurement tool —
not part of the bench contract.

Usage: python scripts/profile_stream.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_segmenter_spark.functions.cache import release_persisted
from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from demo_segmenter_spark.session import get_spark

TWINS = [
    "a_drift_psi_stream",
    "a_drift_report_stream",
    "b_ivm_agg_stream",
    "c_quality_logreg_stream",
    "a_sessionize_stream",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    load_all_operators()
    spark = get_spark(app_name="profile_stream")

    # capture per-batch progress from every streaming query via listener
    from pyspark.sql.streaming import StreamingQueryListener

    progress: list[dict] = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            progress.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(L())

    names = sys.argv[2:] or TWINS
    for name in names:
        # warm
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        release_persisted(spark, owner=True)
        spark.catalog.clearCache()
        progress.clear()
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        release_persisted(spark, owner=True)
        spark.catalog.clearCache()
        time.sleep(0.5)  # let listener drain
        print(f"\n=== {name}: wall {wall:.2f}s, {len(progress)} batches")
        keys = [
            "triggerExecution",
            "queryPlanning",
            "walCommit",
            "commitOffsets",
            "getBatch",
            "latestOffset",
            "addBatch",
        ]
        tot = {k: 0 for k in keys}
        for p in progress:
            d = p.get("durationMs", {})
            for k in keys:
                tot[k] += d.get(k, 0)
            ss = p.get("stateOperators") or []
            commit = sum(s.get("commitTimeMs", 0) for s in ss)
            print(
                "  batch",
                p.get("batchId"),
                {k: d.get(k, 0) for k in keys if d.get(k, 0)},
                f"stateCommitMs={commit}" if ss else "",
            )
        print("  totals:", tot)


if __name__ == "__main__":
    main()
