#!/usr/bin/env python
"""Lane-OFF guard bench (round-13, verdict r12 ask #1): time every
block-lane-gated query with ALL lane caps forced off, so the
DISTRIBUTED chains — the actual 100 TB paths behind the round-12 block
lanes — stay measured round over round instead of being visible only
to equivalence tests. The sf0.1 contract bench cannot see them (the
fixture sits below every cap), so this artifact is the compensating
control: a regression in a distributed chain shows up here as a
timing/exchange-count diff even though the headline bench never runs
that lane.

Writes LANEOFF_r13.json: per-query wall seconds (warm, best-of-N,
noop sink, caches released between runs — the bench.py protocol) plus
the distributed plan's shuffle-exchange count. Run the matching
lane-off ORACLE check with the same env:

  SPARK_GRAFT_GRAPH_BLOCK_EDGES=-1 SPARK_GRAFT_EMB_BLOCK_CAP=-1 \
  SPARK_GRAFT_DOREMI_BLOCK_CAP=-1 SPARK_GRAFT_UNI_BLOCK_CAP=-1 \
  SPARK_GRAFT_TOK_BLOCK_CAP=-1 SPARK_GRAFT_ND_BLOCK_CAP=-1 \
  python scripts/full_oracle_sweep.py <sf_dir> "<names>" <out.json>

Usage: python scripts/laneoff_bench.py [sf_dir] [out.json] [runs]
(The script forces the caps on its own module attributes too, so it
works without the env.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_segmenter_spark.functions.cache import release_persisted
from demo_segmenter_spark.plans.inspect import count_exchanges
from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from demo_segmenter_spark.session import get_spark

# Every lane-gated query path (headline + the non-headline members of
# each gated family).
LANE_QUERIES = [
    # graph block lane (GRAPH_BLOCK_EDGES)
    "b_graph_pagerank",
    "b_graph_components",
    "b_graph_bfs",
    "b_graph_sssp",
    "b_graph_kcore",
    "b_graph_triangles",
    "b_graph_community",
    # embedding block lane (EMB_BLOCK_CAP)
    "c_embed_pca",
    "c_embed_pca_deflate",
    "c_embed_pca_project",
    "c_embed_rq",
    "c_sim_rq_adc",
    "c_embed_pq",
    "c_sim_pq_adc",
    "c_sim_kmeans",
    "c_sim_ivf_trained",
    "c_sim_ivfpq_adc",
    "c_sim_dedup_semantic",
    "c_sim_dedup_kmeans",
    "c_sim_dedup_kmeans_hybrid",
    "c_sim_lsh_native",
    # tokenizer block lanes (TOK_BLOCK_CAP / UNI_BLOCK_CAP)
    "c_token_bpe",
    "c_token_bpe_encode",
    "c_token_windows",
    "c_token_wordpiece_encode",
    "c_token_oov_encode",
    "c_token_byte_fallback",
    "c_token_unigram_encode",
    # mixture lane (DOREMI_BLOCK_CAP)
    "c_mix_doremi",
    # graph-ANN lane (ND_BLOCK_CAP)
    "c_sim_nndescent",
    "c_sim_graph_search",
    "c_sim_graph_layers",
]


def force_lanes_off() -> None:
    import demo_segmenter_spark.operators.layer_b as lb
    import demo_segmenter_spark.operators.layer_c as lc

    lb.GRAPH_BLOCK_EDGES = -1
    lc.EMB_BLOCK_CAP = -1
    lc.DOREMI_BLOCK_CAP = -1
    lc.UNI_BLOCK_CAP = -1
    lc.TOK_BLOCK_CAP = -1
    lc.ND_BLOCK_CAP = -1


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "LANEOFF_r13.json"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    load_all_operators()
    force_lanes_off()
    spark = get_spark(
        app_name="laneoff_bench",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        driver_memory=os.environ.get("SPARK_GRAFT_MEM", "48g"),
    )

    def stamp():
        return {"loadavg": list(os.getloadavg())}

    doc = {
        "mode": "lane_off",
        "sf_dir": sf_dir,
        "runs": runs,
        "machine_before": stamp(),
        "queries": {},
        "exchanges": {},
    }
    # warm pass (codegen/planning amortized out, bench.py protocol)
    for name in LANE_QUERIES:
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        release_persisted(spark, owner=True)
        spark.catalog.clearCache()
    best = {n: float("inf") for n in LANE_QUERIES}
    for _ in range(runs):
        for name in LANE_QUERIES:
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best[name] = min(best[name], time.perf_counter() - t0)
            release_persisted(spark, owner=True)
            spark.catalog.clearCache()
    for name in LANE_QUERIES:
        doc["queries"][name] = round(best[name], 3)
        try:
            doc["exchanges"][name] = count_exchanges(
                REGISTRY[name].fn(spark, sf_dir)
            )
        except Exception as e:  # noqa: BLE001 — plan dump is best-effort
            doc["exchanges"][name] = str(e)[:80]
        release_persisted(spark, owner=True)
        spark.catalog.clearCache()
    doc["total"] = round(sum(doc["queries"].values()), 3)
    doc["machine_after"] = stamp()
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"total": doc["total"], "n": len(LANE_QUERIES)}))


if __name__ == "__main__":
    main()
