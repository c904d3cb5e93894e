"""Streaming incremental-dedup twin (round-9 verdict ask #3): the
profile-build and verdict phases run incrementally via foreachBatch
into versioned-manifest tables and must (a) equal the batch query
exactly, (b) accumulate profile state across micro-batches, (c)
survive crash-replay in EITHER phase without double-adding the
additive shingle-df counts or minting duplicate snapshots."""

from __future__ import annotations

import os
import shutil
import uuid

from demo_segmenter_spark.operators.layer_c import (
    _INCD_SDF_SCHEMA,
    _INCD_VERDICT_SCHEMA,
    run_incdedup_stream,
)
from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from demo_segmenter_spark.sources.python_source import (
    latest_manifest,
    manifest_files,
)
from tests.conftest import SF_SMOKE

load_all_operators()


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _verdicts(spark, base):
    return _rows(
        spark.read.schema(_INCD_VERDICT_SCHEMA)
        .json(manifest_files(f"{base}/verdicts"))
        .select("doc_id", "verdict", "best_match", "best_jaccard")
    )


def test_stream_twin_equals_batch(spark):
    got = _rows(
        REGISTRY["c_dedup_incremental_stream"].fn(spark, SF_SMOKE)
    )
    want = _rows(REGISTRY["c_dedup_incremental"].fn(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_profile_accumulates_across_batches(spark):
    base = f"/tmp/dss_incdedup_stream/mb_{uuid.uuid4().hex[:8]}"
    shutil.rmtree(base, ignore_errors=True)
    run_incdedup_stream(spark, SF_SMOKE, base)
    # three micro-batches per phase reached the manifests
    assert latest_manifest(f"{base}/sdf")["batch_id"] == 2
    assert latest_manifest(f"{base}/verdicts")["batch_id"] == 2
    # the additive df table totals exactly the whole-corpus shingle
    # occurrence count — a dropped or double-added batch breaks this
    from pyspark.sql import functions as F

    from demo_segmenter_spark.operators.layer_c import (
        _hashed_shingles,
        _shingle_doc_table,
    )
    from demo_segmenter_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    want_total = _shingle_doc_table(docs, _hashed_shingles()).count()
    got_total = (
        spark.read.schema(_INCD_SDF_SCHEMA)
        .json(manifest_files(f"{base}/sdf"))
        .agg(F.sum("df"))
        .first()[0]
    )
    assert got_total == want_total
    shutil.rmtree(base, ignore_errors=True)


def test_crash_replay_both_phases_idempotent(spark):
    import time as _time

    from pyspark.sql import functions as F

    from demo_segmenter_spark.operators.layer_c import (
        _incdedup_chunked_src,
        incdedup_profile_sink,
        incdedup_verdict_sink,
    )
    from demo_segmenter_spark.sources import load_table

    base = f"/tmp/dss_incdedup_stream/crash_{uuid.uuid4().hex[:8]}"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    docs = load_table(spark, SF_SMOKE, "documents")
    src_all = _incdedup_chunked_src(spark, docs, f"{base}/all")
    src_inc = _incdedup_chunked_src(
        spark, docs.filter(F.col("doc_id") % 3 == 2), f"{base}/inc"
    )

    def run_a():
        q = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_all)
            .writeStream.foreachBatch(
                incdedup_profile_sink(
                    spark, f"{base}/sdf", f"{base}/cshing", f"{base}/chash"
                )
            )
            .option("checkpointLocation", f"{base}/ckpt_a")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def run_b():
        q = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_inc)
            .writeStream.foreachBatch(
                incdedup_verdict_sink(
                    spark,
                    f"{base}/sdf",
                    f"{base}/cshing",
                    f"{base}/chash",
                    f"{base}/verdicts",
                )
            )
            .option("checkpointLocation", f"{base}/ckpt_b")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def crash(ckpt: str, n: int):
        os.remove(f"{base}/{ckpt}/commits/{n}")
        crc = f"{base}/{ckpt}/commits/.{n}.crc"
        if os.path.exists(crc):
            os.remove(crc)

    run_a()
    sdf_v = latest_manifest(f"{base}/sdf")["version"]
    sdf_total = (
        spark.read.schema(_INCD_SDF_SCHEMA)
        .json(manifest_files(f"{base}/sdf"))
        .agg(F.sum("df"))
        .first()[0]
    )
    # CRASH in phase A: manifest committed for batch 2 but its
    # checkpoint marker lost — replay must NOT double-add dfs
    crash("ckpt_a", 2)
    run_a()
    assert latest_manifest(f"{base}/sdf")["version"] == sdf_v
    assert (
        spark.read.schema(_INCD_SDF_SCHEMA)
        .json(manifest_files(f"{base}/sdf"))
        .agg(F.sum("df"))
        .first()[0]
        == sdf_total
    )

    run_b()
    want = _verdicts(spark, base)
    v_ver = latest_manifest(f"{base}/verdicts")["version"]
    # CRASH in phase B: replayed verdict batch must skip cleanly
    crash("ckpt_b", 2)
    run_b()
    assert latest_manifest(f"{base}/verdicts")["version"] == v_ver
    assert _verdicts(spark, base) == want
    # and the final table still equals the batch query
    assert want == _rows(REGISTRY["c_dedup_incremental"].fn(spark, SF_SMOKE))
    shutil.rmtree(base, ignore_errors=True)
