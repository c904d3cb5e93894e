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


def test_bpe_train_encode_round_trip(spark):
    # Round-6 verdict ask #1: ENCODING with the trained merge artifact
    # (bpe_encode_tokens, literal 1-row broadcast per rank — the
    # production path where merges come from a tokenizer file) must
    # round-trip the planted merges: applying the trained ranks to the
    # training corpus reproduces training's final tokenization, and the
    # registered query's per-token rows agree.
    from demo_segmenter_spark.operators.layer_c import (
        _bpe_tokenize0,
        bpe_encode_tokens,
    )
    from demo_segmenter_spark.sources import load_table

    sf = _tmp_sf(spark)
    trained = sorted(
        REGISTRY["c_token_bpe"].fn(spark, sf).collect(), key=lambda r: r["round"]
    )
    merges = [(r["tok_a"], r["tok_b"]) for r in trained]
    assert merges == [("a", "a"), ("a_a", "a")]  # the planted ranks

    toks = _bpe_tokenize0(load_table(spark, sf, "documents"))
    enc = bpe_encode_tokens(spark, toks, merges)
    got = {
        (r["doc_id"], r["pos"]): r["tok"] for r in enc.collect()
    }
    # expected final tokenizations after rank-ordered greedy passes
    want_docs = {
        # 'a a a a a' -> a_a a_a a; rank-2 pair (a_a, a) occurs at the
        # SECOND a_a only -> a_a a_a_a
        0: ["a_a", "a_a_a"],
        # 'a a a b a a' -> a_a a b a_a -> a_a_a b a_a
        1: ["a_a_a", "b", "a_a"],
        2: ["x", "y"],
    }
    want = {
        (d, i + 1): t for d, ts in want_docs.items() for i, t in enumerate(ts)
    }
    assert got == want, got

    # the registered query emits the same tokens (plus vocab ids whose
    # order follows the sorted final vocab) and matches its own oracle
    q = REGISTRY["c_token_bpe_encode"]
    rows = q.fn(spark, sf).collect()
    assert {(r["doc_id"], r["pos"]): r["tok"] for r in rows} == want
    vocab_sorted = sorted({t for ts in want_docs.values() for t in ts})
    want_ids = {t: i + 1 for i, t in enumerate(vocab_sorted)}
    for r in rows:
        assert r["token_id"] == want_ids[r["tok"]]
        assert r["n_tokens"] == len(want_docs[r["doc_id"]])
    ddb = duckdb.connect()
    ddb.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    oracle = {tuple(r) for r in ddb.execute(q.oracle).fetchall()}
    assert {tuple(r) for r in rows} == oracle
