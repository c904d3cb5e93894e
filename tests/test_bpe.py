"""Greedy-overlap semantics for c_token_bpe, pinned on a crafted corpus.

The fixture's argmax pairs are always (A,B) with A != B, so the
oracle hash-match never exercises the consecutive-occurrence run
logic (overlaps only exist when A == B). This corpus forces an
(a,a) argmax with runs of length 4, 2 and 1, and asserts the exact
merge tables AND Spark/DuckDB agreement on the same temp dir."""

from __future__ import annotations

import os
import uuid

import duckdb

from demo_segmenter_spark.registry import REGISTRY, load_all_operators

load_all_operators()

DOCS = [
    # (doc_id, text): run-of-4 (merge idx 1,3), run-of-2 + isolated,
    # and an inert doc
    (0, "a a a a a"),
    (1, "a a a b a a"),
    (2, "x y"),
]


def _tmp_sf(spark) -> str:
    d = f"/tmp/dss_bpe/{uuid.uuid4().hex[:8]}"
    os.makedirs(d, exist_ok=True)
    rows = [
        (i, t, "en", "unit", len(t)) for i, t in DOCS
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_bpe_greedy_overlap_runs(spark):
    sf = _tmp_sf(spark)
    got = {
        tuple(r)
        for r in REGISTRY["c_token_bpe"].fn(spark, sf).collect()
    }
    # round 1: (a,a) x7 pairs but only 4 greedy merges:
    #   doc0 run 1-4 -> merge at occ 1 and 3; doc1 run 1-2 -> occ 1;
    #   doc1 isolated occ at 5 -> merge
    # round 2: sequences are now [a_a a_a a], [a_a a b a_a], [x y]:
    #   argmax (a_a, a) x2, no overlap -> 2 merges
    want = {
        (1, "a", "a", 7, 4, "a_a"),
        (2, "a_a", "a", 2, 2, "a_a_a"),
    }
    assert got == want, got
    # the DuckDB oracle must replay the crafted case identically
    ddb = duckdb.connect()
    ddb.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    oracle = {
        tuple(r) for r in ddb.execute(REGISTRY["c_token_bpe"].oracle).fetchall()
    }
    assert oracle == want, oracle
