"""Naive-Bayes quality classifier (round-9 verdict ask #4): the
train+apply pipeline is closed-form counts, so a pure-python double-
entry reference must reproduce every per-doc micro-nat score exactly
(the repo's third-implementation discipline for learned artifacts)."""

from __future__ import annotations

import hashlib
import math

from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()

STOP = {"the", "a", "of", "and", "to", "in"}


def _bucket(tok: str, nb: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % nb


def test_nb_matches_pure_python_reference(spark):
    from demo_segmenter_spark.operators.layer_c import NB_BUCKETS
    from demo_segmenter_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    ).collect()
    lab = {}
    for r in docs:
        toks = r.text.split(" ")
        nt = len(toks)
        dup = 1.0 - len(set(toks)) * 1.0 / nt
        sr = sum(1 for t in toks if t in STOP) * 1.0 / nt
        label = "pass" if (nt >= 20 and dup <= 0.6 and sr >= 0.01) else "fail"
        is_train = (r.doc_id * 2654435761) % 4294967296 % 100 < 80
        lab[r.doc_id] = (toks, nt, label, is_train)

    npb = [0] * NB_BUCKETS
    nfb = [0] * NB_BUCKETS
    dp = df_ = 0
    for toks, _, label, is_train in lab.values():
        if not is_train:
            continue
        if label == "pass":
            dp += 1
        else:
            df_ += 1
        tgt = npb if label == "pass" else nfb
        for t in toks:
            tgt[_bucket(t, NB_BUCKETS)] += 1
    tp, tf = sum(npb), sum(nfb)
    wm = [
        round(
            math.log(
                ((npb[b] + 1.0) * (tf + NB_BUCKETS))
                / ((nfb[b] + 1.0) * (tp + NB_BUCKETS))
            )
            * 1_000_000
            + 1e-4
        )
        for b in range(NB_BUCKETS)
    ]
    pm = round(math.log(dp * 1.0 / df_) * 1_000_000 + 1e-4)

    rows = REGISTRY["c_quality_nb"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == len(lab)
    for r in rows:
        toks, nt, label, is_train = lab[r.doc_id]
        assert r.label == label and r.is_train == is_train
        assert r.n_toks == nt
        sm = pm + sum(wm[_bucket(t, NB_BUCKETS)] for t in toks)
        want = round(sm / 1e6 * 1e4 + 1e-8) / 1e4 + 0.0
        assert abs(r.log_odds - want) < 1e-9, (r.doc_id, r.log_odds, want)
        assert r.pred == ("pass" if sm >= 0 else "fail")
