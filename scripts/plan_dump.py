#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/r12/ files.

Usage: python scripts/plan_dump.py <suffix> [name ...]
  suffix: 'before' or 'after' (file becomes plans/r12/<name>_<suffix>.txt)
  names:  query names; default = the bench HEADLINE set.

Streaming twins execute their streaming phase during fn() (the
returned DataFrame is only the scoring tail); their dumped plan is the
tail plan, which is still the part a plan diff can speak to.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_segmenter_spark.functions.cache import release_persisted
from demo_segmenter_spark.plans.inspect import count_exchanges, explain_str
from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from demo_segmenter_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        import bench

        names = bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    load_all_operators()
    spark = get_spark(app_name=f"plan_dump_{suffix}")
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = explain_str(df, "formatted")
            nx = count_exchanges(df)
            with open(f"{out_dir}/{name}_{suffix}.txt", "w") as f:
                f.write(f"-- query: {name}  shuffle_exchanges: {nx}\n")
                f.write(plan)
            print(f"{name}: {nx} exchanges, {len(plan)} chars")
        except Exception as exc:  # noqa: BLE001 - survey loop
            print(f"{name}: FAILED {exc!r:.200}")
        finally:
            release_persisted(spark, owner=True)
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
