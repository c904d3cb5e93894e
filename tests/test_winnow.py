"""Winnowing fingerprint guarantees (Schleimer/Wilkerson/Aiken,
SIGMOD 2003), checked on the ACTUAL selection helper the query uses:

1. Detection guarantee — two documents sharing a token run of at least
   w + k - 1 tokens must share at least one fingerprint HASH.
2. Coverage/density guarantee — within one document, consecutive
   selected positions are never more than w apart (every length-w
   window of gram positions contributes a selection).
3. A pure-Python reference (hashlib md5, same 32-bit prefix) must
   reproduce the selected (pos, hash) set exactly — the third-impl
   discipline used for every algorithmic operator.
"""

from __future__ import annotations

import hashlib

from demo_segmenter_spark.operators.layer_c import _winnow_sel

K, W, M = 4, 5, 1048576


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _fps(spark, texts):
    rows = _winnow_sel(_docs(spark, texts)).collect()
    out: dict[int, set[tuple[int, int]]] = {}
    for r in rows:
        h, pos = r.sel // M, M - r.sel % M
        out.setdefault(r.doc_id, set()).add((pos, h))
    return out


def _py_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    toks = text.split(" ")
    m = max(len(toks) - (k - 1), 1)
    hs = []
    for i in range(m):
        gram = " ".join(toks[i : i + k])
        hs.append(int(hashlib.md5(gram.encode()).hexdigest()[:8], 16))
    sel = set()
    for j in range(max(m - (w - 1), 1)):
        win = hs[j : j + w]
        mn = min(win)
        # rightmost occurrence of the minimum
        off = len(win) - 1 - win[::-1].index(mn)
        sel.add((j + off + 1, mn))  # 1-based position
    return sel


def test_winnow_matches_python_reference(spark):
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven twelve",
        "x y z w",  # m == 1: single whole-doc window
        "a b",  # fewer tokens than k: one clamped gram
    ]
    got = _fps(spark, texts)
    for i, t in enumerate(texts):
        # clamped slice for short docs: python slice clamps identically
        assert got[i] == _py_winnow(t), (i, got[i], _py_winnow(t))


def test_winnow_detection_guarantee(spark):
    # Docs 0 and 1 share an 8-token run (w + k - 1 = 8) inside
    # otherwise disjoint text -> must share a fingerprint hash.
    shared = "red orange yellow green blue indigo violet ultraviolet"
    texts = [
        f"aa bb cc dd {shared} ee ff gg hh",
        f"pp qq rr ss tt {shared} uu vv ww",
        "completely different words with no overlap at all here",
    ]
    got = _fps(spark, texts)
    h0 = {h for _, h in got[0]}
    h1 = {h for _, h in got[1]}
    h2 = {h for _, h in got[2]}
    assert h0 & h1, "shared >= w+k-1 token run must share a fingerprint"
    assert not (h0 & h2) and not (h1 & h2)


def test_winnow_coverage_gap_at_most_w(spark):
    text = " ".join(f"tok{i % 17}x{i % 7}" for i in range(200))
    got = _fps(spark, [text])
    pos = sorted(p for p, _ in got[0])
    gaps = [b - a for a, b in zip(pos, pos[1:])]
    assert max(gaps) <= W, (max(gaps), pos[:20])
