"""Streaming PSI drift monitor (round-10): twin-equality against the
batch query plus multibatch STATE accumulation — the per-(type,wnd,bin)
histogram counts must grow monotonically across the six event-time
micro-batches and the final snapshot must carry the whole corpus."""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import functions as F

from demo_segmenter_spark.operators.layer_a import (
    _PSI_CNTS_SCHEMA,
    _psi_chunked_src,
    run_psi_stream,
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
    got = _rows(REGISTRY["a_drift_psi_stream"].fn(spark, SF_SMOKE))
    want = _rows(REGISTRY["a_drift_psi"].fn(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_counts_accumulate_across_batches(spark):
    base = f"/tmp/dss_psi_stream/mb_{uuid.uuid4().hex[:8]}"
    shutil.rmtree(base, ignore_errors=True)
    src, mid = _psi_chunked_src(spark, SF_SMOKE, base)
    run_psi_stream(spark, src, mid, base)
    # six micro-batches committed six snapshots
    assert latest_manifest(f"{base}/cnts")["batch_id"] == 5

    def total(version):
        return (
            spark.read.schema(_PSI_CNTS_SCHEMA)
            .json(manifest_files(f"{base}/cnts", version))
            .agg(F.sum("n"))
            .first()[0]
        )

    n_events = load_table(spark, SF_SMOKE, "events").count()
    totals = [total(v) for v in range(1, 7)]
    # strictly monotone state growth, final == whole corpus
    assert all(a < b for a, b in zip(totals, totals[1:]))
    assert totals[-1] == n_events
    # the boundary splits state: only wnd=0 rows while us < mid
    first = (
        spark.read.schema(_PSI_CNTS_SCHEMA)
        .json(manifest_files(f"{base}/cnts", 1))
    )
    assert first.filter(F.col("wnd") == 1).count() == 0
    shutil.rmtree(base, ignore_errors=True)


def test_chi2_stream_twin_equals_batch(spark):
    # Round-11: the chi2 streaming twin scores the SAME histogram
    # StateStore the PSI stream maintains (one sufficient statistic,
    # two drift monitors) — its output must equal the batch chi2 query
    # row for row.
    got = _rows(REGISTRY["a_drift_chi2_stream"].fn(spark, SF_SMOKE))
    want = _rows(REGISTRY["a_drift_chi2"].fn(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_ksb_stream_twin_equals_batch(spark):
    # Round-12 pass 2: the binned-KS streaming twin scores its final
    # snapshot through the DRIVER-LOCAL numpy tail (_drift_local_fns);
    # the batch query keeps the distributed _ks_binned_from_cnts tail,
    # so row equality here pins the two tails against each other.
    got = _rows(REGISTRY["a_drift_ks_binned_stream"].fn(spark, SF_SMOKE))
    want = _rows(REGISTRY["a_drift_ks_binned"].fn(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_report_stream_equals_batch_bounded_legs(spark):
    # The streaming report (driver-local assembly of all three local
    # tails) must equal the batch report restricted to the bounded
    # legs — the same restriction its oracle encodes.
    got = _rows(REGISTRY["a_drift_report_stream"].fn(spark, SF_SMOKE))
    want = _rows(
        REGISTRY["a_drift_report"]
        .fn(spark, SF_SMOKE)
        .filter(F.col("statistic") != "ks")
    )
    assert got == want and len(got) > 0
