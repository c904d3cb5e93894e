"""Streaming NB trainer (round-10): twin equality with the batch
query plus multibatch sufficient-statistic accumulation — the model
state (per-bucket class counts + the b=-1 prior row) must grow
monotonically across the six micro-batches and finish exactly equal
to the batch query's train-split counts."""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import functions as F

from demo_segmenter_spark.operators.layer_c import (
    _NB_CNT_SCHEMA,
    _incdedup_chunked_src,
    _nb_lab_tok,
    run_nb_stream,
)
from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from demo_segmenter_spark.sources import load_table
from demo_segmenter_spark.sources.python_source import (
    latest_manifest,
    manifest_files,
)
from tests.conftest import SF_SMOKE

load_all_operators()


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_stream_twin_equals_batch(spark):
    got = _rows(REGISTRY["c_quality_nb_stream"].fn(spark, SF_SMOKE))
    want = _rows(REGISTRY["c_quality_nb"].fn(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_model_state_accumulates_across_batches(spark):
    base = f"/tmp/dss_nb_stream/mb_{uuid.uuid4().hex[:8]}"
    shutil.rmtree(base, ignore_errors=True)
    docs = load_table(spark, SF_SMOKE, "documents")
    src = _incdedup_chunked_src(spark, docs, f"{base}/feed", n_chunks=6)
    run_nb_stream(spark, src, docs.schema, base)
    assert latest_manifest(f"{base}/cnts")["batch_id"] == 5

    def state(version=None):
        return spark.read.schema(_NB_CNT_SCHEMA).json(
            manifest_files(f"{base}/cnts", version)
        )

    totals = [
        state(v).agg(F.sum(F.col("npb") + F.col("nfb"))).first()[0]
        for v in range(1, 7)
    ]
    assert all(a < b for a, b in zip(totals, totals[1:]))
    # final state == the batch query's train-split sufficient stats
    lab, tok = _nb_lab_tok(docs)
    want_tok = tok.filter("is_train").count()
    want_docs = lab.filter("is_train").count()
    fin = state()
    assert (
        fin.filter(F.col("b") >= 0)
        .agg(F.sum(F.col("npb") + F.col("nfb")))
        .first()[0]
        == want_tok
    )
    pri = fin.filter(F.col("b") == -1).first()
    assert pri["npb"] + pri["nfb"] == want_docs
    shutil.rmtree(base, ignore_errors=True)
