"""Streaming CDC upsert into the versioned-manifest sink (round-6
verdict ask #3): b_upsert's last-writer-wins MERGE composed with the
jsonl_dir snapshot protocol via foreachBatch. One immutable snapshot
version per micro-batch, time travel across batches, and — the sharp
part — a crash-replay test: deleting the newest checkpoint commit
marker forces Spark to re-deliver the SAME micro-batch with the SAME
batchId on restart, and the batchId idempotence gate must skip it
without minting a duplicate snapshot.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import functions as F

from demo_segmenter_spark.sources.python_source import (
    latest_manifest,
    manifest_files,
    register_sink,
)
from demo_segmenter_spark.streaming.sinks import (
    cdc_upsert_sink,
    write_stream_cdc_upsert,
)

CDC_SCHEMA = "okey long, price double, ver long"

# three CDC change batches: b1 inserts 0..4; b2 updates 1,2 (ver 2) and
# inserts 5; b3 updates 2 twice IN ONE BATCH (ver 3 then 4 — in-batch
# compaction must keep ver 4) and inserts 6
BATCHES = [
    [(k, 10.0 + k, 1) for k in range(5)],
    [(1, 111.0, 2), (2, 122.0, 2), (5, 15.0, 1)],
    [(2, 133.0, 3), (2, 144.0, 4), (6, 16.0, 1)],
]


def _expected_after(n_batches: int) -> dict[int, tuple[float, int]]:
    state: dict[int, tuple[float, int]] = {}
    for batch in BATCHES[:n_batches]:
        # in-batch compaction keeps the max-ver row per key, then the
        # batch overrides the running state (last writer wins)
        compact: dict[int, tuple[float, int]] = {}
        for k, p, v in batch:
            if k not in compact or v > compact[k][1]:
                compact[k] = (p, v)
        state.update(compact)
    return state


def _src_dir(spark, tag: str, n_files: int) -> str:
    base = f"/tmp/dss_cdc/{tag}_{uuid.uuid4().hex[:8]}"
    shutil.rmtree(base, ignore_errors=True)
    src = f"{base}/src"
    os.makedirs(src)
    now = time.time()
    for i in range(n_files):
        d = f"{base}/b{i}"
        spark.createDataFrame(BATCHES[i], CDC_SCHEMA).coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.symlink(f"{d}/{f}", f"{src}/{i}_{f}")
                os.utime(
                    f"{src}/{i}_{f}", (now + i * 10, now + i * 10),
                    follow_symlinks=False,
                )
    return base


def _read_stream(spark, base: str):
    return (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/src")
    )


def _snapshot(spark, path: str, version=None) -> dict[int, tuple[float, int]]:
    files = manifest_files(path, version=version)
    rows = spark.read.schema(CDC_SCHEMA).json(files).collect()
    out = {r["okey"]: (r["price"], r["ver"]) for r in rows}
    assert len(out) == len(rows), "duplicate keys in snapshot"
    return out


def test_cdc_upsert_snapshot_per_batch_with_time_travel(spark):
    register_sink(spark)
    base = _src_dir(spark, "tt", 3)
    path = f"{base}/table"
    q = write_stream_cdc_upsert(
        _read_stream(spark, base), path, f"{base}/ckpt", ["okey"], "ver"
    )
    q.awaitTermination()
    m = latest_manifest(path)
    assert m["version"] == 3 and m["batch_id"] == 2
    # time travel: each snapshot is the merged state after its batch
    for v in (1, 2, 3):
        assert _snapshot(spark, path, version=v) == _expected_after(v), v
    assert _snapshot(spark, path) == _expected_after(3)  # latest pointer


def test_cdc_upsert_replayed_batch_mints_no_duplicate_snapshot(spark):
    register_sink(spark)
    base = _src_dir(spark, "replay", 2)
    path, ckpt = f"{base}/table", f"{base}/ckpt"
    q = write_stream_cdc_upsert(
        _read_stream(spark, base), path, ckpt, ["okey"], "ver"
    )
    q.awaitTermination()
    assert latest_manifest(path)["version"] == 2
    v2 = _snapshot(spark, path, version=2)

    # CRASH SIMULATION: the batch-1 manifest commit landed but the
    # checkpoint commit marker did not — delete commits/1 so the
    # restart re-delivers batch 1 (same offsets, same batchId).
    os.remove(f"{ckpt}/commits/1")
    # the local ChecksumFs keeps a .crc sidecar; a stale one makes the
    # restart's commit rename look like a concurrent writer — drop it
    crc = f"{ckpt}/commits/.1.crc"
    if os.path.exists(crc):
        os.remove(crc)
    # third change file arrives before the restart
    d = f"{base}/b2"
    spark.createDataFrame(BATCHES[2], CDC_SCHEMA).coalesce(1).write.parquet(d)
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            os.symlink(f"{d}/{f}", f"{base}/src/2_{f}")

    q = write_stream_cdc_upsert(
        _read_stream(spark, base), path, ckpt, ["okey"], "ver"
    )
    q.awaitTermination()
    m = latest_manifest(path)
    # replayed batch 1 skipped (no version mint), new batch 2 -> v3
    assert m["version"] == 3 and m["batch_id"] == 2
    assert _snapshot(spark, path, version=2) == v2  # replay left v2 untouched
    assert _snapshot(spark, path) == _expected_after(3)


def test_cdc_upsert_direct_replay_is_noop(spark):
    # unit-level idempotence: calling the sink twice with the same
    # (df, batch_id) leaves the manifest byte-identical
    import json

    register_sink(spark)
    base = f"/tmp/dss_cdc/direct_{uuid.uuid4().hex[:8]}"
    path = f"{base}/table"
    sink = cdc_upsert_sink(path, ["okey"], "ver")
    df = spark.createDataFrame(BATCHES[0], CDC_SCHEMA)
    sink(df, 0)
    with open(f"{path}/_MANIFEST.json") as f:
        first = json.load(f)
    sink(df, 0)  # replay
    with open(f"{path}/_MANIFEST.json") as f:
        assert json.load(f) == first
    sink(spark.createDataFrame(BATCHES[1], CDC_SCHEMA), 1)
    assert latest_manifest(path)["version"] == 2
    assert _snapshot(spark, path) == _expected_after(2)


def test_cdc_upsert_tied_version_is_deterministic(spark):
    # Two CDC rows for one key with EQUAL ver in one batch: the
    # compaction window's total-order tiebreak (remaining columns desc)
    # must pick a deterministic winner — here the higher price — across
    # repeated runs and shuffled input orders.
    register_sink(spark)
    rows = [(7, 70.0, 9), (7, 99.0, 9), (8, 80.0, 1)]
    for attempt in range(3):
        path = f"/tmp/dss_cdc/tie_{uuid.uuid4().hex[:8]}/table"
        sink = cdc_upsert_sink(path, ["okey"], "ver")
        df = (
            spark.createDataFrame(rows, CDC_SCHEMA)
            .repartition(4)  # scramble physical order run-to-run
        )
        sink(df, 0)
        assert _snapshot(spark, path) == {7: (99.0, 9), 8: (80.0, 1)}


def test_scd2_tied_timestamp_is_deterministic(spark):
    # Two changes for one key at the SAME valid_from_us: the lead()
    # re-chain orders by (valid_from_us, attr) so the chain — and which
    # row stays current — is deterministic; the earlier-sorting attr
    # mints a zero-length interval.
    from demo_segmenter_spark.streaming.sinks import scd2_sink

    register_sink(spark)
    for attempt in range(3):
        path = f"/tmp/dss_scd2/tie_{uuid.uuid4().hex[:8]}/table"
        sink = scd2_sink(path, "ckey", "segment")
        df = spark.createDataFrame(
            [(1, "alpha", 1000), (1, "zeta", 1000), (2, "solo", 500)],
            "ckey long, segment string, ts_us long",
        ).repartition(4)
        sink(df, 0)
        got = {
            (r.ckey, r.segment): (r.valid_from_us, r.valid_to_us, r.is_current)
            for r in spark.read.schema(
                "ckey long, segment string, valid_from_us long,"
                " valid_to_us long, is_current long"
            ).json(manifest_files(path)).collect()
        }
        assert got == {
            (1, "alpha"): (1000, 1000, 0),  # zero-length, closed
            (1, "zeta"): (1000, 0, 1),  # current
            (2, "solo"): (500, 0, 1),
        }
