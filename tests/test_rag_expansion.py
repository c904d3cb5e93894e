"""PRF query expansion (round-10): the expansion must actually expand —
new terms disjoint from the base query, and the final ranking must
surface docs the base query alone scores lower (recall bought by the
feedback round)."""

from __future__ import annotations

from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def test_expansion_changes_and_dominates_round1(spark):
    rows = REGISTRY["c_rag_query_expansion"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    # ranks are a permutation of 1..10 ordered by bm25_exp desc
    assert sorted(r["rank"] for r in rows) == list(range(1, 11))
    by_rank = sorted(rows, key=lambda r: r["rank"])
    exps = [r["bm25_exp"] for r in by_rank]
    assert exps == sorted(exps, reverse=True)
    # the expanded score strictly exceeds the original on every row:
    # three new terms were added, and every top doc matched at least
    # one of them (scores are sums of non-negative term scores)
    assert all(r["bm25_exp"] > r["bm25_orig"] for r in rows)
    # the expansion re-ordered retrieval: the expanded top-10 is NOT
    # simply the base-query top-10 (otherwise the feedback round
    # bought nothing on this corpus)
    import duckdb

    base_top = REGISTRY["c_text_bm25"].oracle
    got = {r["doc_id"] for r in rows}
    ddb = duckdb.connect()
    ddb.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    base = {r[0] for r in ddb.execute(base_top).fetchall()}
    assert got != base
