"""Lee-et-al. exact-substring REWRITE pass: token-mass conservation,
identity on untouched docs, and the keep-one-copy guarantee on a
crafted corpus with planted duplication."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from demo_segmenter_spark.operators.layer_c import SUBSTR_K
from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def test_token_mass_conservation_and_identity(spark):
    out = REGISTRY["c_dedup_substring_rewrite"].fn(spark, SF_SMOKE)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    joined = out.join(docs, "doc_id").collect()
    assert len(joined) > 0
    touched = 0
    for r in joined:
        # mass conservation: every token is either kept or removed
        assert r.n_kept + r.n_removed == r.n_tokens, r
        assert r.n_tokens == len(r.text.split(" ")), r
        if r.n_removed == 0:
            # untouched docs rewrite to themselves byte-for-byte
            assert (
                r.rewritten_md5
                == hashlib.md5(r.text.encode()).hexdigest()
            ), r.doc_id
        else:
            touched += 1
            assert (
                r.rewritten_md5
                != hashlib.md5(r.text.encode()).hexdigest()
            ), r.doc_id
    # the fixture corpus DOES contain cross-doc verbatim spans
    # (c_dedup_substring finds pairs), so the rewrite must have bitten
    assert touched > 0


def test_crafted_corpus_keeps_exactly_one_copy(spark):
    # Three docs share one verbatim 8-token span; doc 1 also repeats it
    # internally. Expected: the global first occurrence (doc 1, pos 1)
    # survives, every other occurrence is cut — including doc 1's own
    # second occurrence — and unique filler is untouched.
    span = " ".join(f"dup{i}" for i in range(SUBSTR_K))
    rows = [
        (1, f"{span} mid1 {span} tail1"),
        (2, f"head2 {span} tail2"),
        (3, f"{span} tail3 tail3b"),
        (4, "all unique tokens here nothing shared at all"),
    ]
    import os
    import uuid

    d = f"/tmp/dss_srw/{uuid.uuid4().hex[:8]}"
    os.makedirs(d, exist_ok=True)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # the query loads <sf_dir>/documents.parquet; synthesize a mini dir
    docs.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("crafted")
    ).withColumn("n_chars", F.length("text")).write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    got = {
        r.doc_id: r
        for r in REGISTRY["c_dedup_substring_rewrite"].fn(spark, d).collect()
    }
    # doc 1: 18 tokens; occurrence at pos 1 kept, pos 10 cut (8 tokens)
    assert (got[1].n_tokens, got[1].n_removed) == (18, SUBSTR_K)
    # doc 2: span cut entirely
    assert (got[2].n_tokens, got[2].n_removed) == (10, SUBSTR_K)
    # doc 3: span cut
    assert (got[3].n_tokens, got[3].n_removed) == (10, SUBSTR_K)
    # doc 4: untouched
    assert (got[4].n_tokens, got[4].n_removed) == (8, 0)
    # reassembly: doc 2's survivors are exactly the filler, in order
    assert (
        got[2].rewritten_md5
        == hashlib.md5(b"head2 tail2").hexdigest()
    )
    assert (
        got[1].rewritten_md5
        == hashlib.md5(f"{span} mid1 tail1".encode()).hexdigest()
    )
