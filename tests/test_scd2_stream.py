"""Streaming SCD2 dimension maintenance (streaming/sinks.py::scd2_sink):
the change stream replayed in THREE ts-ordered micro-batches must
produce exactly the batch b_scd2_intervals table — closed intervals
chain across batch boundaries, and each batch mints one immutable
snapshot version (time travel over dimension states; idempotent on
batchId replay)."""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import functions as F

from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from demo_segmenter_spark.sources.python_source import (
    latest_manifest,
    manifest_files,
    register_sink,
)
from demo_segmenter_spark.streaming.sinks import scd2_sink, write_stream_scd2
from tests.test_stream_multibatch import SF, _read_stream, _trickle_src

load_all_operators()


def test_scd2_stream_equals_batch_build(spark):
    register_sink(spark)
    src, _, _ = _trickle_src(spark)
    base = f"/tmp/dss_scd2/{uuid.uuid4().hex[:8]}"
    path, ckpt = f"{base}/table", f"{base}/ckpt"
    try:
        ev = _read_stream(spark, src).select(
            "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
        )
        q = write_stream_scd2(ev, path, ckpt, "user_id", "event_type")
        q.awaitTermination()

        m = latest_manifest(path)
        assert m["version"] >= 3, "one snapshot per micro-batch"
        schema = (
            "user_id long, event_type string, valid_from_us long,"
            " valid_to_us long, is_current long"
        )
        got = {
            tuple(r)
            for r in spark.read.schema(schema).json(manifest_files(path)).collect()
        }
        want = {
            tuple(r)
            for r in REGISTRY["b_scd2_intervals"].fn(spark, SF).collect()
        }
        assert got == want

        # time travel: v1 holds only batch-0 keys' chains; every open
        # row in v1 is either still open in latest or closed later
        v1 = spark.read.schema(schema).json(manifest_files(path, version=1))
        assert 0 < v1.count() < len(want)

        # idempotence: re-applying the LAST batch id mints no snapshot
        sink = scd2_sink(path, "user_id", "event_type")
        sink(
            spark.createDataFrame(
                [(999999, "view", 1)], "user_id long, event_type string, ts_us long"
            ),
            m["batch_id"],
        )
        assert latest_manifest(path)["version"] == m["version"]
    finally:
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(src.rsplit("/", 1)[0], ignore_errors=True)
