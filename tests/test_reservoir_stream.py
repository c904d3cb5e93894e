"""Streaming reservoir sample (round-10): twin-equality against the
batch query plus the SEMILATTICE state contract — every per-batch
snapshot must equal the exact bottom-k of the chunk prefix delivered
so far, the state never exceeds k rows, and the merge is chunking-
invariant (3 chunks == 6 chunks == batch)."""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import functions as F

from demo_segmenter_spark.operators.layer_b import (
    RES_K,
    _RES_STATE_SCHEMA,
    _events_chunked_src,
    _res_rank,
    run_reservoir_stream,
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
    got = _rows(REGISTRY["b_sample_reservoir_stream"].fn(spark, SF_SMOKE))
    want = _rows(REGISTRY["b_sample_reservoir"].fn(spark, SF_SMOKE))
    assert got == want and len(got) == RES_K


def _bottom_k(ev, lo, hi):
    return {
        tuple(r)
        for r in ev.filter(
            (F.col("event_id") >= lo) & (F.col("event_id") < hi)
        )
        .orderBy("rk", "event_id")
        .limit(RES_K)
        .collect()
    }


def test_snapshots_equal_prefix_bottom_k(spark):
    n_chunks = 6
    base = f"/tmp/dss_res_stream/mb_{uuid.uuid4().hex[:8]}"
    shutil.rmtree(base, ignore_errors=True)
    src = _events_chunked_src(spark, SF_SMOKE, base, n_chunks=n_chunks)
    run_reservoir_stream(spark, src, base)
    assert latest_manifest(f"{base}/res")["batch_id"] == n_chunks - 1
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", _res_rank().alias("rk")
    )
    hi_all = ev.agg(F.max("event_id")).first()[0] + 1
    cuts = [i * hi_all // n_chunks for i in range(n_chunks)] + [hi_all]
    for v in range(1, n_chunks + 1):
        snap = {
            tuple(r)
            for r in spark.read.schema(_RES_STATE_SCHEMA)
            .json(manifest_files(f"{base}/res", version=v))
            .collect()
        }
        # state never exceeds k rows — the whole point of a reservoir
        assert len(snap) <= RES_K
        # snapshot v == exact bottom-k of chunks [0, v) — replaying
        # history through the semilattice reconstructs the batch answer
        assert snap == _bottom_k(ev, 0, cuts[v])


def test_chunking_invariance(spark):
    outs = []
    for n_chunks in (3, 6):
        base = f"/tmp/dss_res_stream/ci{n_chunks}_{uuid.uuid4().hex[:8]}"
        shutil.rmtree(base, ignore_errors=True)
        src = _events_chunked_src(spark, SF_SMOKE, base, n_chunks=n_chunks)
        run_reservoir_stream(spark, src, base)
        outs.append(
            {
                tuple(r)
                for r in spark.read.schema(_RES_STATE_SCHEMA)
                .json(manifest_files(f"{base}/res"))
                .collect()
            }
        )
    assert outs[0] == outs[1] and len(outs[0]) == RES_K
