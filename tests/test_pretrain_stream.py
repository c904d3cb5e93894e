"""Streaming pretrain-pipeline twin (round-8 / verdict ask #5): the
gate→scrub stages run incrementally via foreachBatch into the
versioned-manifest tables and must (a) equal the batch pipeline
exactly, (b) survive a crash-replay without minting duplicate
snapshots or double-counting block ownership."""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import functions as F

from demo_segmenter_spark.operators.layer_c import (
    _PRETRAIN_DOCS_SCHEMA,
    _pretrain_bins,
    pretrain_stream_sink,
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


def _chunked_src(spark, base: str, n_chunks: int = 3) -> None:
    docs = load_table(spark, SF_SMOKE, "documents")
    src = f"{base}/src"
    os.makedirs(src)
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    cuts = [i * hi // n_chunks for i in range(n_chunks)] + [hi]
    now = time.time()
    for i in range(n_chunks):
        d = f"{base}/b{i}"
        docs.filter(
            (F.col("doc_id") >= cuts[i]) & (F.col("doc_id") < cuts[i + 1])
        ).coalesce(1).write.parquet(d)
        for fname in os.listdir(d):
            if fname.endswith(".parquet"):
                os.symlink(f"{d}/{fname}", f"{src}/{i}_{fname}")
                os.utime(
                    f"{src}/{i}_{fname}",
                    (now + i * 10, now + i * 10),
                    follow_symlinks=False,
                )


def _run(spark, base: str):
    docs = load_table(spark, SF_SMOKE, "documents")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/src")
    )
    q = (
        stream.writeStream.foreachBatch(
            pretrain_stream_sink(spark, f"{base}/blocks", f"{base}/docs")
        )
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _final(spark, base: str):
    scrubbed = (
        spark.read.schema(_PRETRAIN_DOCS_SCHEMA)
        .json(manifest_files(f"{base}/docs"))
        .select("doc_id", "lang", "kept_words")
    )
    return _pretrain_bins(scrubbed)


def test_stream_twin_equals_batch_pipeline(spark):
    got = _rows(REGISTRY["c_pipeline_pretrain_stream"].fn(spark, SF_SMOKE))
    want = _rows(REGISTRY["c_pipeline_pretrain"].fn(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_crash_replay_is_idempotent(spark):
    base = f"/tmp/dss_pretrain_stream/crash_{uuid.uuid4().hex[:8]}"
    shutil.rmtree(base, ignore_errors=True)
    _chunked_src(spark, base)
    _run(spark, base)
    mb = latest_manifest(f"{base}/blocks")
    md = latest_manifest(f"{base}/docs")
    assert mb["batch_id"] == 2 and md["batch_id"] == 2
    vb, vd = mb["version"], md["version"]
    want = _rows(_final(spark, base))
    doc_rows = _rows(
        spark.read.schema(_PRETRAIN_DOCS_SCHEMA).json(
            manifest_files(f"{base}/docs")
        )
    )

    # CRASH SIMULATION: the batch-2 table commits landed but the
    # checkpoint commit marker did not — the restart re-delivers the
    # SAME micro-batch with the SAME batchId; both tables' idempotence
    # gates must skip it without a duplicate snapshot or double count.
    os.remove(f"{base}/ckpt/commits/2")
    crc = f"{base}/ckpt/commits/.2.crc"
    if os.path.exists(crc):
        os.remove(crc)
    _run(spark, base)

    assert latest_manifest(f"{base}/blocks")["version"] == vb
    assert latest_manifest(f"{base}/docs")["version"] == vd
    assert (
        _rows(
            spark.read.schema(_PRETRAIN_DOCS_SCHEMA).json(
                manifest_files(f"{base}/docs")
            )
        )
        == doc_rows
    )
    assert _rows(_final(spark, base)) == want
    # and the replayed table still equals the batch pipeline
    assert want == _rows(REGISTRY["c_pipeline_pretrain"].fn(spark, SF_SMOKE))
    shutil.rmtree(base, ignore_errors=True)


def test_block_ownership_is_first_writer_wins(spark):
    # A block hash seen in batch 0 must keep its (doc_id, blk) owner
    # even though batch 1+ docs repeat the same block content: the
    # blocks table's owner doc_id for every hash is the global minimum
    # doc that carries it (doc_id-ordered arrival == global first).
    base = f"/tmp/dss_pretrain_stream/own_{uuid.uuid4().hex[:8]}"
    shutil.rmtree(base, ignore_errors=True)
    _chunked_src(spark, base)
    _run(spark, base)
    from demo_segmenter_spark.operators.layer_c import (
        _PRETRAIN_BLOCKS_SCHEMA,
    )

    snap = spark.read.schema(_PRETRAIN_BLOCKS_SCHEMA).json(
        manifest_files(f"{base}/blocks")
    )
    assert snap.groupBy("bhash").count().filter("count > 1").count() == 0
    # independent DuckDB replay of the batch rn=1 ownership rule: the
    # streamed table's (bhash -> owner doc_id, blk) must be EXACTLY
    # the global (doc_id, blk)-first occurrence per block hash, and
    # the per-doc kept_words must match the batch scrub stage
    import duckdb

    from demo_segmenter_spark.operators.layer_c import PARA_BLOCK

    ref = duckdb.sql(
        f"""
        WITH gated AS (
            SELECT doc_id, lang, string_split(text, ' ') AS w
            FROM read_parquet('{SF_SMOKE}/documents.parquet')
            WHERE n_chars >= 200
              AND len(list_distinct(string_split(text, ' '))) * 1.0
                  / len(string_split(text, ' ')) >= 0.3
        ), blks AS (
            SELECT doc_id, lang, w,
                   unnest(generate_series(CAST(0 AS BIGINT),
                       (len(w) + {PARA_BLOCK - 1}) // {PARA_BLOCK} - 1))
                       AS blk
            FROM gated
        ), b AS (
            SELECT doc_id, lang, blk,
                   array_to_string(list_slice(w, blk * {PARA_BLOCK} + 1,
                       blk * {PARA_BLOCK} + {PARA_BLOCK}), ' ') AS btxt
            FROM blks
        ), r AS (
            SELECT doc_id, blk, md5(btxt) AS bhash,
                   len(string_split(btxt, ' ')) AS nwords,
                   row_number() OVER (PARTITION BY md5(btxt)
                                      ORDER BY doc_id, blk) AS rn
            FROM b
        )
        SELECT bhash, doc_id, blk, nwords FROM r WHERE rn = 1
        """
    ).fetchall()
    want_owner = {h: (d, bk, nw) for h, d, bk, nw in ref}
    got_owner = {
        r.bhash: (r.doc_id, r.blk, r.nwords) for r in snap.collect()
    }
    assert got_owner == want_owner
    shutil.rmtree(base, ignore_errors=True)
