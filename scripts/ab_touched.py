#!/usr/bin/env python
"""Ad-hoc solo timing of named queries (warm pass + best-of-N noop
runs), for A/B-ing a working-tree edit against HEAD via git stash.
Not part of the bench contract.

Usage: python scripts/ab_touched.py <label> <name> [name ...]
Prints one JSON line {label, times:{name: best_sec}}.
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


def run_once(name: str, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = REGISTRY[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    release_persisted(spark, owner=True)
    spark.catalog.clearCache()
    return dt


def main() -> None:
    label = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all_operators()
    spark = get_spark(app_name="ab_touched", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:  # warm: codegen, footers
        run_once(name, spark, sf_dir)
    best: dict[str, float] = {}
    for _ in range(3):
        for name in names:
            spark.sparkContext.setJobDescription(f"{label} {name}")
            dt = run_once(name, spark, sf_dir)
            best[name] = min(best.get(name, 1e9), dt)
    print(json.dumps({"label": label, "times": {k: round(v, 3) for k, v in best.items()}}))


if __name__ == "__main__":
    main()
