"""Invariant pins for the round-7 quality/curation ops: mixture
reweighting semantics and a pure-Python bigram-LM reference."""

from __future__ import annotations

import math

from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def test_mix_reweight_invariants(spark):
    rows = REGISTRY["c_mix_reweight"].fn(spark, SF_SMOKE).collect()
    assert rows
    # weights form a (rounded) distribution
    total_w = sum(r["w_micro"] for r in rows)
    assert abs(total_w - 1_000_000) <= len(rows)  # per-source rounding only
    # temperature 0.5 flattens: a source with a SMALLER share must get a
    # weight/share ratio >= a larger source's (sqrt compresses the range)
    by_share = sorted(rows, key=lambda r: r["share"])
    ratios = [r["w_micro"] / r["share"] for r in by_share if r["share"] > 0]
    for a, b in zip(ratios, ratios[1:]):
        assert a >= b - 1e-6
    # deterministic sample: n_sampled <= n_docs and reproducible
    again = {
        r["source"]: r["n_sampled"]
        for r in REGISTRY["c_mix_reweight"].fn(spark, SF_SMOKE).collect()
    }
    for r in rows:
        assert 0 <= r["n_sampled"] <= r["n_docs"]
        assert again[r["source"]] == r["n_sampled"]


def test_bigram_lp_matches_python_reference(spark):
    # pure-Python replay of the add-1-smoothed bigram model on the
    # fixture corpus — an implementation sharing nothing with either
    # engine beyond the math.
    from demo_segmenter_spark.sources import load_table

    docs = [
        (r["doc_id"], r["text"].split(" "))
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .collect()
    ]
    big: dict[tuple[str, str], int] = {}
    uni: dict[str, int] = {}
    vocab = set()
    for _, toks in docs:
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            uni[a] = uni.get(a, 0) + 1
    v = len(vocab)
    want = {}
    for doc_id, toks in docs:
        lps = [
            round(
                math.log((big[(a, b)] + 1.0) / (uni[a] + v)) * 1_000_000
                + 1e-04
            )
            for a, b in zip(toks, toks[1:])
        ]
        if lps:
            want[doc_id] = (
                len(lps),
                round(sum(lps) / 1_000_000.0 / len(lps) + 1e-06, 2) + 0.0,
            )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in REGISTRY["c_quality_bigram_lp"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want
