"""Fixture-regeneration guard (round-4 advice): several hash oracles
are sound only because the CURRENT fixture's pair-similarity spectrum
keeps clear of their sensitive bands. These tests MEASURE the spectrum
and fail with a pointed message if a regenerated fixture moves it —
so a future sweep failure says "the fixture broke the pin" instead of
looking like an operator bug.

Pins guarded here:
- c_dedup_minhash_native (operators/layer_c.py MINHASH_BANDS note):
  every true >=0.5-Jaccard pair sits at j >= 0.889, keeping analytic
  band-miss <= 3.9e-4 per pair. A true pair at mid-range Jaccard
  (~0.5-0.85) would have material miss probability and could
  hash-mismatch the oracle with no code bug.
- c_sim_lsh_native engine margins: the oracle recomputes hyperplane
  sign sums and the cosine threshold with a different float summation
  ORDER than Spark's fold; agreement relies on no |sum| or
  |cos - threshold| sitting within float-noise of the decision
  boundary (measured margins are ~1e-5, noise is ~1e-13).
- tests/test_ann.py recall pins (>= 0.95 / >= 0.98) are fixture-scale
  empirical per the round-3 advice; the embedding-spectrum assertions
  below say when a regen invalidates their basis.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from demo_segmenter_spark.operators.layer_c import (
    RHP_BANDS,
    RHP_COS_THRESHOLD,
    RHP_ROWS,
    _rhp_plane,
)
from tests.conftest import SF_SMOKE


def _doc_shingle_sets() -> dict[int, frozenset[str]]:
    t = pq.read_table(SF_SMOKE + "/documents.parquet", columns=["doc_id", "text"])
    out = {}
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = text.split(" ")
        out[doc_id] = frozenset(
            " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))
        )
    return out


def _unit_embeddings() -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(SF_SMOKE + "/embeddings.parquet", columns=["embedding"])
    x = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    return x, x / np.linalg.norm(x, axis=1, keepdims=True)


def test_shingle_jaccard_spectrum_keeps_minhash_miss_negligible():
    # Soundness condition for c_dedup_minhash_native's full hash
    # oracle: every TRUE pair (j >= the 0.5 output threshold) must be
    # caught by the 8x4 banding. The hashes are deterministic, so
    # whether each pair is caught is FIXED (the committed sweeps prove
    # all current ones are) — but the analytic band-miss probability
    # (1 - j^4)^8 says how fragile that is: ~4e-4 at the fixture's
    # lowest true pair (j=0.889), ~40% at j=0.5. Pairs BELOW the
    # threshold never threaten soundness (missed sub-threshold
    # candidates are not in the oracle's answer either, and false
    # candidates are removed by the exact verify).
    sets = [s for s in _doc_shingle_sets().values() if s]
    true_pairs = []
    for a in range(len(sets)):
        sa = sets[a]
        for b in range(a + 1, len(sets)):
            sb = sets[b]
            inter = len(sa & sb)
            if not inter:
                continue
            j = inter / (len(sa) + len(sb) - inter)
            if j >= 0.5:
                true_pairs.append(j)
    assert true_pairs, "fixture lost its planted near-dup pairs entirely"
    worst = min(true_pairs)
    worst_miss = (1 - worst**4) ** 8
    budget = sum((1 - j**4) ** 8 for j in true_pairs)
    assert worst_miss < 5e-3 and budget < 1e-2, (
        f"documents fixture regenerated with a true pair at Jaccard "
        f"{worst:.4f} (analytic 8x4 band-miss {worst_miss:.2e}, total "
        f"expected misses {budget:.2e} over {len(true_pairs)} pairs): "
        "c_dedup_minhash_native's full hash oracle assumes banding "
        "catches every j>=0.5 pair. Re-run the dual-scale sweeps; if "
        "they mismatch, raise MINHASH_BANDS/MINHASH_ROWS or downgrade "
        "the query to a rows-only oracle — the operator is not buggy."
    )


def test_rhp_sign_margin_exceeds_float_noise():
    x, _ = _unit_embeddings()
    planes = np.array([_rhp_plane(h) for h in range(RHP_ROWS * RHP_BANDS)])
    s = x @ planes.T
    margin = np.abs(s).min()
    assert margin > 1e-9, (
        f"embeddings fixture has a hyperplane sum at |s|={margin:.2e}: "
        "Spark's deterministic fold and DuckDB's unordered sum differ by "
        "~1e-13, so a sign bit this close to 0 can flip between engines "
        "and silently change c_sim_lsh_native's buckets. Regenerate or "
        "re-seed the planes (bump the md5 namespace string)."
    )


def test_rhp_cosine_threshold_margin_exceeds_float_noise():
    _, u = _unit_embeddings()
    c = u @ u.T
    iu = np.triu_indices(len(u), 1)
    margin = np.abs(c[iu] - RHP_COS_THRESHOLD).min()
    assert margin > 1e-9, (
        f"embeddings fixture has a pair at |cos-{RHP_COS_THRESHOLD}|="
        f"{margin:.2e}: the c_sim_lsh_native >= threshold filter is "
        "evaluated on floats accumulated in different orders by Spark "
        "and DuckDB; a pair this close to the threshold can land on "
        "different sides and hash-mismatch with no code bug."
    )


def test_embedding_spectrum_documents_ann_recall_basis():
    # The test_ann.py pins (ml-LSH recall@3 >= 0.98, minhash recall >=
    # 0.95, lsh_native recall >= 0.7) were measured on a spectrum with
    # max cosine ~0.48 and no pair above 0.55. A regenerated fixture
    # with planted high-cosine near-dups would make recall EASIER, but
    # a flatter spectrum (top pairs barely above the 0.4/0.35
    # thresholds) silently erodes them — surface that here instead.
    _, u = _unit_embeddings()
    c = u @ u.T
    iu = np.triu_indices(len(u), 1)
    top = np.sort(c[iu])[-3:]
    assert top[-1] >= 0.42, (
        f"embeddings fixture max cosine fell to {top[-1]:.4f}: the ANN "
        "recall pins in tests/test_ann.py were measured against a "
        "spectrum topping out near 0.48 — re-measure them before "
        "trusting a sweep at this spectrum."
    )
