"""Incremental view maintenance (retraction changelog): the batch fold
and the streaming twin must agree with each other and with the direct
recompute over net-surviving rows — the defining IVM equality — and
the streaming twin must actually process the changelog as multiple
seq-ordered micro-batches through bounded complete-mode state."""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener

from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_maintained_equals_direct(spark):
    out = REGISTRY["b_ivm_agg"].fn(spark, SF_SMOKE).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_rows"] == r["n_direct"], r
        assert r["sum_price"] == r["sum_direct"], r


def test_stream_twin_equals_batch(spark):
    got = _rows(REGISTRY["b_ivm_agg_stream"].fn(spark, SF_SMOKE))
    want = _rows(REGISTRY["b_ivm_agg"].fn(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_stream_twin_is_multibatch(spark):
    """The seq-chunked feed must deliver >= 4 micro-batches (inserts,
    deletes, and the update retraction pairs land in separate
    triggers) — otherwise the twin degenerates to a batch run."""
    batches = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            if event.progress.numInputRows > 0:
                batches.append(event.progress.numInputRows)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = L()
    spark.streams.addListener(listener)
    try:
        REGISTRY["b_ivm_agg_stream"].fn(spark, SF_SMOKE).collect()
        import time

        time.sleep(2)  # let the last progress events drain
    finally:
        spark.streams.removeListener(listener)
    assert len(batches) >= 4, batches
