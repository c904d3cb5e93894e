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


def test_bloom_stream_twin_and_order_insensitive_filter(spark):
    """c_dedup_bloom_stream: twin-equality with the batch query, and
    the filter itself is split-insensitive — words built from a
    3-chunk replay equal the 6-chunk replay's AND the batch build's
    (bit_or commutativity is the correctness argument for streaming
    the filter)."""
    from pyspark.sql import functions as F

    from demo_segmenter_spark.operators.layer_c import (
        BLOOM_M,
        BLOOM_W,
        _BLOOM_WORDS_SCHEMA,
        run_bloom_stream,
    )

    got = _rows(REGISTRY["c_dedup_bloom_stream"].fn(spark, SF_SMOKE))
    want = _rows(REGISTRY["c_dedup_bloom"].fn(spark, SF_SMOKE))
    assert got == want and len(got) > 0

    docs = load_table(spark, SF_SMOKE, "documents")

    def words_via(n_chunks):
        base = f"/tmp/dss_bloom_stream/oi{n_chunks}_{uuid.uuid4().hex[:8]}"
        shutil.rmtree(base, ignore_errors=True)
        src = _incdedup_chunked_src(
            spark, docs, f"{base}/feed", n_chunks=n_chunks
        )
        run_bloom_stream(spark, src, docs.schema, base)
        out = _rows(
            spark.read.schema(_BLOOM_WORDS_SCHEMA).json(
                manifest_files(f"{base}/words")
            )
        )
        shutil.rmtree(base, ignore_errors=True)
        return out

    # batch-built reference filter
    j = F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j")
    pos = (
        F.conv(F.expr("substr(h, 8 * j - 7, 8)"), 16, 10).cast("long")
        % BLOOM_M
    )
    batch_words = _rows(
        docs.filter(F.col("doc_id") % 3 != 2)
        .select(F.md5("text").alias("h"), j)
        .select(pos.alias("pos"))
        .groupBy(F.expr(f"pos DIV {BLOOM_W}").alias("wi"))
        .agg(
            F.bit_or(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT),"
                    f" CAST(pos % {BLOOM_W} AS INT))"
                )
            ).alias("w")
        )
    )
    assert words_via(3) == words_via(6) == batch_words
