"""WordPiece tokenizer family (round-10 verdict ask #3): likelihood
scoring (pair_count / (cnt_left * cnt_right), integer-quantized),
greedy longest-match-first encoding against the trained vocab, and a
byte-certified decode round-trip — written BEFORE the implementation
(the BPE '_'-joiner lesson: the round-trip test is the tokenizer's
real spec)."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_round_trip_all_fixture_docs(spark):
    out = REGISTRY["c_token_wordpiece_decode"].fn(spark, SF_SMOKE)
    n = out.count()
    assert n > 0
    assert out.filter(F.col("round_trip") != 1).count() == 0


def test_wordpiece_score_differs_from_bpe_count(spark):
    """The family's defining property: a rare-but-exclusive pair must
    beat a frequent-but-diluted pair. Corpus: (the,r) occurs 3x but
    'the'/'r' each occur 3x (score 3e9//9); (x,y) occurs once with
    singleton sides (score 1e9//1) -> WordPiece merges (x,y) first,
    where BPE's count argmax would pick (the,r)."""
    from demo_segmenter_spark.operators.layer_c import _wp_train_docs

    docs = _docs(spark, ["the r the r the r", "x y"])
    _, _, _, bests, _ = _wp_train_docs(docs)
    r1 = bests[0].first()
    assert (r1["ba"], r1["bb"]) == ("x", "y")
    assert r1["pair_count"] == 1 and r1["ca"] == 1 and r1["cb"] == 1
    assert r1["sq"] == 1_000_000_000
    r2 = bests[1].first()
    assert (r2["ba"], r2["bb"]) == ("the", "r")
    assert r2["sq"] == 3_000_000_000 // 9


def test_overlap_run_merges_once_and_round_trips(spark):
    """'a a a' under pair (a,a): exactly one merge (odd occurrences of
    the run), and the greedy encode of the same corpus round-trips."""
    from demo_segmenter_spark.operators.layer_c import (
        _wp_train_docs,
        wordpiece_encode_docs,
    )

    docs = _docs(spark, ["a a a"])
    _, _, _, bests, ms = _wp_train_docs(docs)
    r1 = bests[0].first()
    assert (r1["ba"], r1["bb"]) == ("a", "a")
    n_merges = ms[0].agg(
        F.sum(F.col("merged").cast("int"))
    ).first()[0]
    assert n_merges == 1
    enc = wordpiece_encode_docs(docs)
    got = [
        (r["pos"], r["tok"])
        for r in enc.orderBy("pos").collect()
    ]
    # greedy longest-match-first: a_a (round-2 merged a_a_a wins if
    # trained; with one doc round 2 merges (a_a, a) -> a_a_a)
    assert got == [(1, "a_a_a")]
    rebuilt = " ".join(t.replace("_", " ") for _, t in got)
    assert rebuilt == "a a a"


def test_greedy_encode_matches_python_reference(spark):
    """Third-implementation check (iterative-alg discipline): a pure
    python greedy longest-match over the same trained vocab must
    reproduce the Spark segmentation token for token."""
    from demo_segmenter_spark.operators.layer_c import (
        _wp_train_docs,
        wordpiece_encode_docs,
    )

    texts = ["the r the r the r", "x y", "q x y the r", "solo"]
    docs = _docs(spark, texts)
    _, t0, _, bests, _ = _wp_train_docs(docs)
    vocab = {r["tok"] for r in t0.select("tok").distinct().collect()}
    for b in bests:
        r = b.first()
        vocab.add(f"{r['ba']}_{r['bb']}")

    def ref(words):
        out, i = [], 0
        while i < len(words):
            for l in range(min(4, len(words) - i), 0, -1):
                piece = "_".join(words[i : i + l])
                if piece in vocab:
                    out.append(piece)
                    i += l
                    break
        return out

    enc = wordpiece_encode_docs(docs)
    got = {
        doc_id: [t for _, t in sorted((r["pos"], r["tok"]) for r in rows)]
        for doc_id, rows in (
            (k, list(g))
            for k, g in __import__("itertools").groupby(
                sorted(enc.collect(), key=lambda r: (r["doc_id"], r["pos"])),
                key=lambda r: r["doc_id"],
            )
        )
    }
    for i, t in enumerate(texts):
        assert got[i + 1] == ref(t.split(" ")), t


def test_oov_encode_unk_rate_positive_and_matches_reference(spark):
    """Round-11: the first encode certification on UNSEEN text. On the
    fixture's held-out (odd doc_id) half, at least one word must be
    absent from the even-half vocabulary (is_unk fires), every UNK row
    carries the sentinel, and a pure-python replay of the split-trained
    greedy UNK walk reproduces the Spark segmentation exactly on a
    crafted corpus where the held-out half contains both seen and
    unseen words."""
    from demo_segmenter_spark.operators.layer_c import (
        WP_LMAX,
        WP_UNK,
        _wp_train_docs,
        wordpiece_encode_docs,
    )

    # fixture: strictly positive held-out UNK rate, sane bounds
    out = REGISTRY["c_token_oov_encode"].fn(spark, SF_SMOKE)
    rows = out.collect()
    n_unk = sum(r["is_unk"] for r in rows)
    assert n_unk > 0, "held-out half produced no UNK — vocab leak?"
    assert 0 < n_unk < len(rows)
    assert all(r["tok"] == WP_UNK for r in rows if r["is_unk"] == 1)
    assert all(r["tok"] != WP_UNK for r in rows if r["is_unk"] == 0)

    # crafted corpus, third implementation: 'zz'/'qq' appear only in
    # the held-out docs 1 and 3; TRAIN = {2, 4} (doc_id % 2 == 0,
    # doc_id is 1-based), HELD = {1, 3}
    texts = ["the r zz the r", "the r the r x y", "qq solo x", "x y solo the r"]
    docs = _docs(spark, texts)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    held = docs.filter(F.col("doc_id") % 2 == 1)
    _, t0, _, bests, _ = _wp_train_docs(train)
    vocab = {r["tok"] for r in t0.select("tok").distinct().collect()}
    for b in bests:
        r = b.first()
        vocab.add(f"{r['ba']}_{r['bb']}")

    def ref(words):
        out, i = [], 0
        while i < len(words):
            for l in range(min(WP_LMAX, len(words) - i), 0, -1):
                piece = "_".join(words[i : i + l])
                if piece in vocab:
                    out.append(piece)
                    i += l
                    break
            else:
                out.append(WP_UNK)
                i += 1
        return out

    enc = wordpiece_encode_docs(held, vocab, unk=WP_UNK)
    got = {}
    for r in sorted(enc.collect(), key=lambda r: (r["doc_id"], r["pos"])):
        got.setdefault(r["doc_id"], []).append(r["tok"])
    for doc_id in (1, 3):
        want = ref(texts[doc_id - 1].split(" "))
        assert got[doc_id] == want, (doc_id, got[doc_id], want)
        assert WP_UNK in got[doc_id]  # 'zz' / 'qq' are genuinely unseen
