"""Approximate-NN quality gates: the IVF and LSH variants must find a
meaningful share of the exact brute-force top-k neighborhood (the
rows-only driver check alone would accept garbage)."""

from __future__ import annotations

from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ivf_recall_vs_exact(spark):
    exact = _pairs(REGISTRY["c_sim_knn"].fn(spark, SF_SMOKE))
    approx = _pairs(REGISTRY["c_sim_ivf"].fn(spark, SF_SMOKE))
    assert approx, "IVF returned no neighbors"
    # IVF searches one cluster only; still must overlap the true top-5.
    assert len(approx & exact) / len(approx) >= 0.3


def test_lsh_recall_vs_exact(spark):
    exact = _pairs(REGISTRY["c_sim_knn"].fn(spark, SF_SMOKE))
    approx = _pairs(REGISTRY["c_sim_lsh"].fn(spark, SF_SMOKE))
    assert approx, "LSH returned no neighbors"
    hits = len(approx & exact)
    assert hits / len(approx) >= 0.5, f"LSH precision too low: {hits}/{len(approx)}"


def test_lsh_bounded_k(spark):
    df = REGISTRY["c_sim_lsh"].fn(spark, SF_SMOKE)
    per_q = df.groupBy("query_id").count().collect()
    assert all(r["count"] <= 3 for r in per_q)
