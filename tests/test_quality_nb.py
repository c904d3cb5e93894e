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


def test_logreg_monotone_loss_accuracy_floor_and_python_replica(spark):
    """Round-11 logistic regression: (a) held-out accuracy clears the
    floor and beats NB on the same labels/split (margin features see
    the dup ratio, token buckets can't); (b) a pure-python integer
    replica of the gradient dynamics reproduces the Spark logits
    EXACTLY and its train logloss decreases monotonically every round
    (the smooth-regime eta claim)."""
    import math

    from demo_segmenter_spark.operators.layer_c import LR_ETA_DEN, LR_ROUNDS
    from demo_segmenter_spark.sources import load_table

    rows = REGISTRY["c_quality_logreg"].fn(spark, SF_SMOKE).collect()
    held = [r for r in rows if not r["is_train"]]
    train = [r for r in rows if r["is_train"]]
    acc_h = sum(r["pred"] == r["label"] for r in held) / len(held)
    acc_t = sum(r["pred"] == r["label"] for r in train) / len(train)
    assert acc_t >= 0.75, acc_t
    assert acc_h >= 0.70, acc_h
    nb = REGISTRY["c_quality_nb"].fn(spark, SF_SMOKE).collect()
    nb_h = [r for r in nb if not r["is_train"]]
    nb_acc = sum(r["pred"] == r["label"] for r in nb_h) / len(nb_h)
    assert acc_h > nb_acc, (acc_h, nb_acc)

    # python third implementation, integer-exact
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    ).collect()
    SW = ("the", "a", "of", "and", "to", "in")
    feats, ys, istr = {}, {}, {}
    for r in docs:
        toks = r["text"].split(" ")
        nt, nd = len(toks), len(set(toks))
        ns = sum(t in SW for t in toks)
        lab = 1 if (nt >= 20 and 1 - nd / nt <= 0.6 and ns / nt >= 0.01) else 0
        ys[r["doc_id"]] = lab
        istr[r["doc_id"]] = (r["doc_id"] * 2654435761) % 4294967296 % 100 < 80
        feats[r["doc_id"]] = {
            -1: 1,
            -2: min(nt, 100) - 20,
            -3: (1000 * nd) // nt - 400,
            -4: (1000 * ns) // nt - 10,
        }

    def truncdiv(a, b):
        return a // b if a >= 0 else -((-a) // b)

    tr = [d for d in feats if istr[d]]
    w = {b: 0 for b in (-1, -2, -3, -4)}
    losses = []
    for _ in range(LR_ROUNDS):
        grad = {b: 0 for b in w}
        loss = 0.0
        for d in tr:
            lm = sum(x * w[b] for b, x in feats[d].items())
            z = lm / 1e6
            p = 1.0 / (1.0 + math.exp(-max(min(z, 700), -700)))
            loss -= ys[d] * math.log(max(p, 1e-300)) + (1 - ys[d]) * math.log(
                max(1 - p, 1e-300)
            )
            pm = math.floor(1e6 * p + 1e-4 + 0.5)  # HALF_UP like F.round
            rr = ys[d] * 1_000_000 - pm
            for b, x in feats[d].items():
                grad[b] += x * rr
        for b in w:
            w[b] += truncdiv(grad[b], LR_ETA_DEN * len(tr))
        losses.append(loss / len(tr))
    assert all(
        losses[i + 1] < losses[i] for i in range(len(losses) - 1)
    ), losses
    got = {r["doc_id"]: r["logit"] for r in rows}
    for d, f in feats.items():
        lm = sum(x * w[b] for b, x in f.items())
        want = round(lm / 1e6 + 1e-8, 4) + 0.0
        assert abs(got[d] - want) < 1e-9, (d, got[d], want, lm)
