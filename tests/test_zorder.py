"""Z-order layout (round-10): the zone maps must actually BUY data
skipping on BOTH dimensions — measured as the fraction of files a
point predicate can prune, compared against a single-column sort
layout whose trailing dimension prunes (almost) nothing."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from demo_segmenter_spark.operators.layer_b import ZORD_FILES
from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from demo_segmenter_spark.sources import load_table
from tests.conftest import SF_SMOKE

load_all_operators()


def _prune_frac(zones, dim, probes):
    """Fraction of (file, probe) pairs a point predicate dim=c can
    skip using the [min, max] zone map."""
    lo, hi = f"{dim}min", f"{dim}max"
    total = len(zones) * len(probes)
    skipped = sum(
        1 for z in zones for c in probes if c < z[lo] or c > z[hi]
    )
    return skipped / total


def test_zone_maps_cover_and_partition(spark):
    zones = [
        r.asDict()
        for r in REGISTRY["b_layout_zorder"].fn(spark, SF_SMOKE).collect()
    ]
    li = load_table(spark, SF_SMOKE, "lineitem")
    assert sum(z["n_rows"] for z in zones) == li.count()
    assert len(zones) == ZORD_FILES
    # balanced integer cut: file sizes differ by at most 1
    sizes = [z["n_rows"] for z in zones]
    assert max(sizes) - min(sizes) <= 1


def test_zorder_prunes_both_dims_vs_single_sort(spark):
    zones = [
        r.asDict()
        for r in REGISTRY["b_layout_zorder"].fn(spark, SF_SMOKE).collect()
    ]
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        (F.col("l_partkey")).alias("a"),
        (F.col("l_suppkey")).alias("b"),
        "l_orderkey",
        "l_linenumber",
    )
    probes_a = [r["a"] for r in li.select("a").distinct().limit(20).collect()]
    probes_b = [r["b"] for r in li.select("b").distinct().limit(20).collect()]

    # baseline layout: sort by a ONLY, same file count, same zone maps
    w = Window.orderBy("a", "l_orderkey", "l_linenumber")
    ranked = li.select(
        "a", "b", F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    base = [
        r.asDict()
        for r in ranked.select(
            F.expr(f"(rn - 1) * {ZORD_FILES} DIV n").alias("file_id"), "a", "b"
        )
        .groupBy("file_id")
        .agg(
            F.min("a").alias("amin"), F.max("a").alias("amax"),
            F.min("b").alias("bmin"), F.max("b").alias("bmax"),
        )
        .collect()
    ]
    z_a = _prune_frac(zones, "a", probes_a)
    z_b = _prune_frac(zones, "b", probes_b)
    s_a = _prune_frac(base, "a", probes_a)
    s_b = _prune_frac(base, "b", probes_b)
    # the z layout prunes meaningfully on BOTH dims; the single-column
    # sort is great on its leading dim and useless on the trailing one
    assert z_a >= 0.5, z_a
    assert z_b >= 0.5, z_b
    assert s_b <= 0.1, s_b
    # the leading-dim advantage z-order gives up is the price of
    # balance: it must still beat the baseline's TRAILING dim by far
    assert min(z_a, z_b) > 4 * s_b
