#!/usr/bin/env python
"""Above-cap fixture bench (round-13, verdict r12 ask #1): build a
fixture that sits ABOVE the block-lane caps — embeddings replicated to
26 k vectors (> EMB_BLOCK_CAP / ND_BLOCK_CAP = 20 k) and lineitem
replicated so the graph queries see > GRAPH_BLOCK_EDGES = 1 M distinct
edges — and run the gated families on it with NO cap overrides, so the
lane gates route to the distributed chains naturally and those chains
get timed (not just row-identity-tested) every round.

Replication is deterministic: copy r gets id-offset keys derived from
the fixture maxima, so replicas can never collide (the scale_smoke
stride lesson). Writes ABOVECAP_r13.json with per-query seconds and
the fixture row counts.

Usage: python scripts/abovecap_bench.py [out.json] [runs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from demo_segmenter_spark.functions.cache import release_persisted
from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from demo_segmenter_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
FIX = "/tmp/dss_abovecap_fixture"

EMB_QUERIES = [
    "c_embed_pca",
    "c_embed_pca_deflate",
    "c_embed_rq",
    "c_sim_kmeans",
    "c_sim_ivf_trained",
    "c_sim_ivfpq_adc",
    "c_sim_dedup_semantic",
    "c_sim_lsh_native",
    "c_sim_nndescent",
    "c_sim_graph_search",
    "c_sim_graph_layers",
]
GRAPH_QUERIES = [
    "b_graph_pagerank",
    "b_graph_components",
    "b_graph_bfs",
    "b_graph_kcore",
    "b_graph_community",
]


def build_fixture() -> dict:
    shutil.rmtree(FIX, ignore_errors=True)
    os.makedirs(FIX)
    counts = {}
    # embeddings x13 = 26k vectors (> 20k caps): offset vec_id per copy
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    stride = pc.max(t.column("vec_id")).as_py() + 1
    idx = t.schema.get_field_index("vec_id")
    parts = [
        t.set_column(idx, "vec_id", pc.add(t.column("vec_id"), r * stride))
        for r in range(13)
    ]
    emb = pa.concat_tables(parts)
    pq.write_table(emb, f"{FIX}/embeddings.parquet")
    counts["embeddings"] = emb.num_rows
    # lineitem x2 with offset orderkey AND partkey so the derived
    # (2*orderkey, 2*partkey+1) edge set is disjoint per copy -> ~1.18M
    # distinct edges (> GRAPH_BLOCK_EDGES)
    li = pq.read_table(f"{SRC}/lineitem.parquet")
    ostride = pc.max(li.column("l_orderkey")).as_py() + 1
    pstride = pc.max(li.column("l_partkey")).as_py() + 1
    oi = li.schema.get_field_index("l_orderkey")
    pi = li.schema.get_field_index("l_partkey")
    parts = []
    for r in range(2):
        t2 = li.set_column(
            oi, "l_orderkey", pc.add(li.column("l_orderkey"), r * ostride)
        )
        t2 = t2.set_column(
            pi, "l_partkey", pc.add(t2.column("l_partkey"), r * pstride)
        )
        parts.append(t2)
    li2 = pa.concat_tables(parts)
    pq.write_table(li2, f"{FIX}/lineitem.parquet")
    counts["lineitem"] = li2.num_rows
    # everything else links to the sf0.1 originals
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "events",
        "documents",
    ):
        os.symlink(f"{SRC}/{name}.parquet", f"{FIX}/{name}.parquet")
    return counts


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "ABOVECAP_r13.json"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    counts = build_fixture()
    load_all_operators()
    spark = get_spark(
        app_name="abovecap_bench",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        driver_memory=os.environ.get("SPARK_GRAFT_MEM", "48g"),
    )
    names = EMB_QUERIES + GRAPH_QUERIES
    doc = {
        "mode": "above_cap_natural_gating",
        "fixture_rows": counts,
        "runs": runs,
        "machine_before": {"loadavg": list(os.getloadavg())},
        "queries": {},
    }
    for name in names:  # warm
        REGISTRY[name].fn(spark, FIX).write.format("noop").mode(
            "overwrite"
        ).save()
        release_persisted(spark, owner=True)
        spark.catalog.clearCache()
    best = {n: float("inf") for n in names}
    for _ in range(runs):
        for name in names:
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, FIX).write.format("noop").mode(
                "overwrite"
            ).save()
            best[name] = min(best[name], time.perf_counter() - t0)
            release_persisted(spark, owner=True)
            spark.catalog.clearCache()
    doc["queries"] = {n: round(t, 3) for n, t in best.items()}
    doc["total"] = round(sum(best.values()), 3)
    doc["machine_after"] = {"loadavg": list(os.getloadavg())}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    shutil.rmtree(FIX, ignore_errors=True)
    print(json.dumps({"total": doc["total"], "rows": counts}))


if __name__ == "__main__":
    main()
