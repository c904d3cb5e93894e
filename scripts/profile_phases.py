#!/usr/bin/env python
"""Phase-level profiler for the expensive headline families (guide §1:
measure first). Wraps selected internal helpers with timers, runs each
named query once warm through the noop sink, and prints a per-phase
breakdown. Ad-hoc measurement tool — not part of the bench contract.

Usage: python scripts/profile_phases.py <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_segmenter_spark.functions.cache import release_persisted
from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from demo_segmenter_spark.session import get_spark

PHASES: list[tuple[str, float]] = []


def _wrap(mod, name):
    orig = getattr(mod, name)
    if getattr(orig, "_wrapped", False):
        return

    def timed(*a, **k):
        t0 = time.perf_counter()
        try:
            return orig(*a, **k)
        finally:
            PHASES.append((name, time.perf_counter() - t0))

    timed._wrapped = True
    setattr(mod, name, timed)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all_operators()

    import demo_segmenter_spark.operators.layer_a as la
    import demo_segmenter_spark.operators.layer_b as lb
    import demo_segmenter_spark.operators.layer_c as lc

    for mod, fns in (
        (la, [
            "_psi_chunked_src", "run_psi_stream", "_psi_stream_cnts",
            "_psi_from_cnts", "_fkjoin_chunked_src",
        ]),
        (lc, [
            "_nd_matrix", "_nd_build_graph", "_nd_round", "_nd_score_pairs",
            "_nd_topk", "_nd_exact_sample", "_gs_serve", "_gl_skip_edges",
            "_nd_base", "_rhp_candidate_pairs", "_lr_gd_profiles",
            "run_logreg_stream", "_incdedup_chunked_src", "_wp_train_docs",
            "wordpiece_encode_docs", "wordpiece_encode_docs_bytes",
            "_kmeans_train", "_ivfpq_scored",
            "_unigram_corpus", "_unigram_train", "_unigram_viterbi",
            "_unigram_ilogp", "_unigram_counts",
        ]),
        (lb, []),
    ):
        for fn in fns:
            if hasattr(mod, fn):
                _wrap(mod, fn)

    spark = get_spark(app_name="profile_phases")
    for name in names:
        # warm pass (codegen, parquet footers), then the measured pass
        for tag in ("warm", "timed"):
            PHASES.clear()
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            t_total = time.perf_counter() - t0
            if tag == "timed":
                print(f"\n=== {name}: total {t_total:.3f}s "
                      f"(fn() {t_build:.3f}s, sink {t_total - t_build:.3f}s)")
                for ph, dt in PHASES:
                    print(f"    {ph:<28} {dt:8.3f}s")
            release_persisted(spark, owner=True)
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
