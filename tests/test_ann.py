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


def test_lsh_recall_column_visible_and_high(spark):
    # The SQL-visible invariant: one global recall@3 value on every row,
    # deterministic under the fixed seed, >= 0.98 at fixture scale.
    df = REGISTRY["c_sim_lsh"].fn(spark, SF_SMOKE)
    vals = [r["recall_at3_vs_exact"] for r in df.select("recall_at3_vs_exact").distinct().collect()]
    assert len(vals) == 1, vals
    assert vals[0] >= 0.98, vals


def test_minhash_invariant_columns(spark):
    # Every exact-path pair (shingle Jaccard sim >= 0.4) must be found
    # by MinHashLSH: recall_vs_exact == 1.0 at fixture scale, and the
    # per-pair exact_dist agrees with the LSH-reported vector distance
    # (HashingTF collisions are the only slack).
    rows = REGISTRY["c_dedup_minhash"].fn(spark, SF_SMOKE).collect()
    assert rows
    recalls = {r["recall_vs_exact"] for r in rows}
    assert recalls == {1.0}, recalls
    for r in rows:
        if r["exact_dist"] is not None:
            assert abs(r["exact_dist"] - r["jaccard_dist"]) <= 0.01, r
