"""Independent-implementation property test for c_dedup_minhash_native
(same idea as the sessionization and CC property tests): on random
corpora, the banding+verify pipeline must emit ONLY true >=0.5-Jaccard
pairs with exactly the reference Jaccard values (false positives are
impossible by construction — the exact-verify stage), and must FIND
every pair far above threshold (j >= 0.95, where the band-miss
probability is ~1.4e-6 — misses near j=0.5 are legitimate LSH physics,
so those pairs are excluded from the recall assertion, not from the
precision one)."""

from __future__ import annotations

import random

from demo_segmenter_spark.registry import REGISTRY, load_all_operators

load_all_operators()


def _shingle_set(text: str, k: int = 3) -> set:
    toks = text.split(" ")
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _exact_pairs(docs: dict[int, str], thr: float) -> dict[tuple, float]:
    out = {}
    ids = sorted(docs)
    for i, a in enumerate(ids):
        sa = _shingle_set(docs[a])
        if not sa:
            continue
        for b in ids[i + 1 :]:
            sb = _shingle_set(docs[b])
            if not sb:
                continue
            inter = len(sa & sb)
            j = inter / (len(sa) + len(sb) - inter)
            if j >= thr:
                out[(a, b)] = round(j, 4)
    return out


def _corpus(rng: random.Random, n_docs: int) -> dict[int, str]:
    """Random docs over a small vocab plus planted near-dup pairs at
    controlled similarity levels."""
    vocab = [f"w{i}" for i in range(40)]
    docs = {}
    for d in range(n_docs):
        docs[d] = " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 30)))
    # planted pairs: identical, one-token-edit, and half-overlap
    base = " ".join(rng.choice(vocab) for _ in range(24))
    docs[1000] = base
    docs[1001] = base  # j = 1.0
    toks = base.split(" ")
    toks[12] = "zz"
    docs[1002] = " ".join(toks)  # high-but-not-1 jaccard
    docs[1003] = base + " " + " ".join(rng.choice(vocab) for _ in range(24))
    return docs


def test_native_minhash_matches_python_reference(spark):
    rng = random.Random(7)
    for trial in range(3):
        docs = _corpus(rng, n_docs=30)
        sdf = spark.createDataFrame(
            [(d, t, "en", "web") for d, t in docs.items()],
            "doc_id long, text string, lang string, source string",
        )
        # the EXACT pipeline the query composes, over the synthetic corpus
        import demo_segmenter_spark.operators.layer_c as lc
        from pyspark.sql import functions as F

        hs = lc._hashed_shingles()  # the exact expression the query uses
        sh = sdf.select("doc_id", hs.alias("hset")).filter(F.size("hset") > 0)
        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in lc._minhash_verified_pairs(sh, threshold=0.5).collect()
        }

        want = _exact_pairs(docs, 0.5)
        # precision: every emitted pair is a true pair with the exact value
        for pair, j in got.items():
            assert pair in want, (trial, pair, j)
            assert abs(j - want[pair]) <= 1e-9, (trial, pair, j, want[pair])
        # recall: certain far above threshold
        must_find = {p for p, j in want.items() if j >= 0.95}
        assert must_find <= set(got), (trial, must_find - set(got))
