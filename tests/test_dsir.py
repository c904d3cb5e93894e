"""DSIR data selection (round-10): pure-python THIRD implementation of
the hashed-n-gram importance weights (hashlib md5, integer micro-nats)
against the Spark query, plus the paper's sanity check — the selected
slice must be dominated by the target language."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb

from demo_segmenter_spark.operators.layer_c import (
    DSIR_BUCKETS,
    DSIR_KEEP_DEN,
    DSIR_TARGET_LANG,
)
from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def _bucket(feat: str) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS


def _python_logw(rows):
    """(doc_id, lang, text) -> {doc_id: (n_feats, logw_micro)} — the
    whole model fit + scoring, no Spark, no SQL."""
    cr: Counter = Counter()
    ct: Counter = Counter()
    doc_feats = {}
    for doc_id, lang, text in rows:
        ws = text.split(" ")
        feats = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        bs = [_bucket(f) for f in feats]
        doc_feats[doc_id] = bs
        cr.update(bs)
        if lang == DSIR_TARGET_LANG:
            ct.update(bs)
    nr, nt = sum(cr.values()), sum(ct.values())
    lr = {
        b: round(
            math.log(
                ((ct[b] + 1.0) * (nr + DSIR_BUCKETS))
                / ((cr[b] + 1.0) * (nt + DSIR_BUCKETS))
            )
            * 1_000_000
            + 1e-4
        )
        for b in cr
    }
    return {
        d: (len(bs), sum(lr[b] for b in bs)) for d, bs in doc_feats.items()
    }


def test_python_third_implementation_matches(spark):
    rows = duckdb.sql(
        "SELECT doc_id, lang, text FROM"
        f" read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    want = _python_logw(rows)
    got = {
        r["doc_id"]: (r["n_feats"], r["logw_micro"])
        for r in REGISTRY["c_select_dsir"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_selected_slice_is_target_dominated(spark):
    out = REGISTRY["c_select_dsir"].fn(spark, SF_SMOKE).collect()
    n = len(out)
    sel = [r for r in out if r["selected"] == 1]
    assert len(sel) == -(-n // DSIR_KEEP_DEN)  # exactly ceil(n/den)
    base_share = sum(r["lang"] == DSIR_TARGET_LANG for r in out) / n
    sel_share = sum(r["lang"] == DSIR_TARGET_LANG for r in sel) / len(sel)
    # the paper's effect: importance weights concentrate the target
    # domain far beyond its corpus share (0.3 -> ~0.9 on this fixture)
    assert sel_share >= 2 * base_share, (sel_share, base_share)
    # selection is exactly the top slice of the score order
    floor_sel = min((r["logw_micro"], -r["doc_id"]) for r in sel)
    for r in out:
        if r["selected"] == 0:
            assert (r["logw_micro"], -r["doc_id"]) < floor_sel


def test_stream_twin_equals_batch(spark):
    got = {
        tuple(r)
        for r in REGISTRY["c_select_dsir_stream"].fn(spark, SF_SMOKE).collect()
    }
    want = {
        tuple(r)
        for r in REGISTRY["c_select_dsir"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0


def test_stream_counts_accumulate(spark):
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from demo_segmenter_spark.operators.layer_c import (
        _DSIR_CNT_SCHEMA,
        _incdedup_chunked_src,
        run_dsir_stream,
    )
    from demo_segmenter_spark.sources import load_table
    from demo_segmenter_spark.sources.python_source import (
        latest_manifest,
        manifest_files,
    )

    base = f"/tmp/dss_dsir_stream/mb_{uuid.uuid4().hex[:8]}"
    shutil.rmtree(base, ignore_errors=True)
    docs = load_table(spark, SF_SMOKE, "documents")
    src = _incdedup_chunked_src(spark, docs, f"{base}/feed", n_chunks=6)
    run_dsir_stream(spark, src, docs.schema, base)
    assert latest_manifest(f"{base}/cnts")["batch_id"] == 5

    def totals(version):
        r = (
            spark.read.schema(_DSIR_CNT_SCHEMA)
            .json(manifest_files(f"{base}/cnts", version))
            .agg(F.sum("cr"), F.sum("ct"))
            .first()
        )
        return r[0], r[1]

    hist = [totals(v) for v in range(1, 7)]
    # sufficient statistics grow monotonically (strictly for cr —
    # every chunk carries features) and target <= raw at every step
    assert all(a[0] < b[0] for a, b in zip(hist, hist[1:]))
    assert all(ct <= cr for cr, ct in hist)
    # final snapshot == the whole-corpus feature counts
    from demo_segmenter_spark.operators.layer_c import _dsir_feats
    from demo_segmenter_spark.sources import spread

    feats = _dsir_feats(spread(docs))
    n_all = feats.count()
    n_tgt = feats.filter(F.col("lang") == "en").count()
    assert hist[-1] == (n_all, n_tgt)
