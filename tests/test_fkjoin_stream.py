"""Streaming KIP-213 FK join twin (round-10 verdict ask #2): the
foreachBatch topology must (a) equal the batch query exactly on the
fixture for the interleaved two-changelog replay, (b) propagate a
RIGHT-table update to stored left rows without a left-side arrival,
(c) retract (tombstone) the join row when a left FK re-points to a
not-yet-seen supplier, then re-emit once that supplier arrives —
verified batch-by-batch through the out table's snapshot versions."""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import functions as F

from demo_segmenter_spark.operators.layer_a import (
    _FKJ_OUT_SCHEMA,
    _FKJ_SRC_SCHEMA,
    fkjoin_stream_result,
    run_fkjoin_stream,
)
from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from demo_segmenter_spark.sources.python_source import manifest_files
from tests.conftest import SF_SMOKE

load_all_operators()


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_stream_twin_equals_batch(spark):
    got = _rows(REGISTRY["a_ktable_fk_join_stream"].fn(spark, SF_SMOKE))
    want = _rows(REGISTRY["a_ktable_fk_join"].fn(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def _crafted_src(spark, base):
    """Four micro-batches exercising both propagation directions:
    b0: left (order 1, v1 -> supp 10) + right supp 10 'ALPHA'
    b1: right supp 10 renamed 'BRAVO'        (right update fan-out)
    b2: left (order 1, v2 -> supp 20), supp 20 UNSEEN  (tombstone)
    b3: right supp 20 'CHARLIE'              (late supplier re-emit)
    """
    L = lambda ok, v, fk, pr: ("L", ok, v, fk, pr, None, None, None)
    R = lambda sk, nm, nt: ("R", None, None, None, None, sk, nm, nt)
    batches = [
        [L(1, 1, 10, 100.0), R(10, "ALPHA", 5)],
        [R(10, "BRAVO", 5)],
        [L(1, 2, 20, 200.0)],
        [R(20, "CHARLIE", 7)],
    ]
    src = f"{base}/src"
    os.makedirs(src)
    now = time.time()
    for i, rows in enumerate(batches):
        d = f"{base}/b{i}"
        spark.createDataFrame(rows, _FKJ_SRC_SCHEMA).coalesce(1).write.parquet(d)
        for fname in os.listdir(d):
            if fname.endswith(".parquet"):
                link = f"{src}/{i}_{fname}"
                os.symlink(f"{d}/{fname}", link)
                os.utime(link, (now + i * 10, now + i * 10), follow_symlinks=False)
    return src


def _out_at(spark, base, version):
    return (
        spark.read.schema(_FKJ_OUT_SCHEMA)
        .json(manifest_files(f"{base}/out", version))
        .select("l_orderkey", "version", "supp_key", "supp_name", "ver")
    )


def test_cross_batch_fk_change_and_retraction(spark):
    base = f"/tmp/dss_fkjoin_stream/crafted_{uuid.uuid4().hex[:8]}"
    shutil.rmtree(base, ignore_errors=True)
    orders = spark.createDataFrame(
        [(1, 999.0)], "o_orderkey long, o_totalprice double"
    )
    src = _crafted_src(spark, base)
    run_fkjoin_stream(spark, src, orders, base)

    # v1 (batch 0): initial join row through supplier ALPHA
    assert _rows(_out_at(spark, base, 1)) == {(1, 1, 10, "ALPHA", 0)}
    # v2 (batch 1): RIGHT-side rename re-emits the stored left row —
    # no left arrival in this batch (the KIP-213 fan-out direction)
    assert _rows(_out_at(spark, base, 2)) == {(1, 1, 10, "BRAVO", 1)}
    # v3 (batch 2): FK re-pointed to unseen supp 20 -> tombstone
    assert _rows(_out_at(spark, base, 3)) == {(1, 2, 20, None, 2)}
    # v4 (batch 3): supplier 20 arrives -> join row restored
    assert _rows(_out_at(spark, base, 4)) == {(1, 2, 20, "CHARLIE", 3)}

    # final inner-join view: one row, fully joined, money columns set
    final = fkjoin_stream_result(spark, base)
    assert _rows(final) == {(1, 2, 20, "CHARLIE", 7, 200.0, 999.0)}
    shutil.rmtree(base, ignore_errors=True)


def test_tombstone_hidden_mid_stream(spark):
    """The inner-join view at snapshot v2 must NOT show order 1: a
    tombstoned key is absent, not a stale ALPHA/BRAVO row."""
    base = f"/tmp/dss_fkjoin_stream/tomb_{uuid.uuid4().hex[:8]}"
    shutil.rmtree(base, ignore_errors=True)
    orders = spark.createDataFrame(
        [(1, 999.0)], "o_orderkey long, o_totalprice double"
    )
    src = _crafted_src(spark, base)
    run_fkjoin_stream(spark, src, orders, base)
    v2 = (  # snapshot v3 == after batch 2 (versions are 1-based)
        spark.read.schema(_FKJ_OUT_SCHEMA)
        .json(manifest_files(f"{base}/out", 3))
        .filter(F.col("supp_name").isNotNull())
    )
    assert v2.count() == 0
    shutil.rmtree(base, ignore_errors=True)
