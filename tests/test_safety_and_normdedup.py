"""Safety blocklist + normalized exact dedup: crafted-input semantics
(the fixture exercises normalized dedup only at sf0.1, so the
equivalence-class rules are pinned here on a crafted corpus)."""

from __future__ import annotations

import os
import uuid

from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def _crafted_docs(spark):
    rows = [
        # 0/1: differ only by case + stopword placement -> same class
        (0, "Big Scan of the Table", "en", "web", 22),
        (1, "big scan table", "en", "web", 14),
        # 2: distinct content
        (2, "merge sort window", "en", "web", 17),
        # 3: all-stopwords -> empty normal form
        (3, "the a of", "en", "web", 8),
        # 4: another all-stopwords doc -> shares the empty class
        (4, "of and to", "en", "web", 9),
        # 5/6: blocklist semantics — 'slow' excused by adjacent 'fast',
        # three unexcused hits -> blocked
        (5, "fast slow join", "en", "web", 14),
        (6, "slow dup slow merge", "en", "web", 19),
        (7, "clean text here", "en", "web", 15),
    ]
    base = f"/tmp/dss_crafted/{uuid.uuid4().hex[:8]}"
    os.makedirs(base)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{base}/documents.parquet")
    return base


def test_normalized_dedup_crafted_classes(spark):
    base = _crafted_docs(spark)
    rows = REGISTRY["c_dedup_exact_normalized"].fn(spark, base).collect()
    got = {(r.doc_id, r.canon_id, r.group_size) for r in rows}
    assert got == {(0, 0, 2), (1, 0, 2), (3, 3, 2), (4, 3, 2)}, got


def test_blocklist_crafted_verdicts(spark):
    base = _crafted_docs(spark)
    rows = REGISTRY["c_safety_blocklist"].fn(spark, base).collect()
    v = {r.doc_id: (r.n_hits, r.n_excused, r.verdict) for r in rows}
    assert v[5] == (0, 1, "clean")  # 'slow' excused by adjacent 'fast'
    assert v[6] == (3, 0, "blocked")
    assert v[7] == (0, 0, "clean")
    assert len(v) == 8  # one row per doc, always


def test_blocklist_fixture_has_all_tiers(spark):
    rows = REGISTRY["c_safety_blocklist"].fn(spark, SF_SMOKE).collect()
    verdicts = {r.verdict for r in rows}
    assert "clean" in verdicts and "flagged" in verdicts, verdicts


def test_phash_dedup_crafted_planted_pair(spark):
    # Two blobs sharing their first 240 bytes must hash identically
    # (hamming 0) and surface as a pair; an unrelated byte pattern
    # must not pair with them at the threshold.
    import os
    import uuid

    shared = ("alpha beta gamma delta " * 20)[:300]
    rows = [
        (0, shared + " tail one", "en", "web", 309),
        (1, shared + " other tail entirely", "en", "web", 320),
        (2, "zz " * 100, "en", "web", 300),
    ]
    base = f"/tmp/dss_crafted/{uuid.uuid4().hex[:8]}"
    os.makedirs(base)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{base}/documents.parquet")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in REGISTRY["c_multimodal_phash_dedup"].fn(spark, base).collect()
    }
    assert got.get((0, 1)) == 0, got
    assert all(2 not in pair for pair in got), got


def test_dedup_report_families_are_ordered(spark):
    # exact-affected docs are a subset of normalized-affected by
    # construction (the normal form only merges classes)
    rows = {
        r.family: r.n_affected
        for r in REGISTRY["c_dedup_report"].fn(spark, SF_SMOKE).collect()
    }
    assert set(rows) == {"exact", "normalized", "near_jaccard_05"}
    assert rows["exact"] <= rows["normalized"], rows
