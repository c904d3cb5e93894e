"""Streaming logistic-regression trainer (round-12, verdict r11 ask
#4): twin equality against the batch GD query (SAME oracle, so the
driver certifies it too), multibatch accumulation of the margin-profile
sufficient statistic, and the profile-replay identity that makes the
twin exact."""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import functions as F

from demo_segmenter_spark.operators.layer_c import (
    _LRS_CNT_SCHEMA,
    _incdedup_chunked_src,
    _lr_gd_profiles,
    run_logreg_stream,
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
    got = _rows(REGISTRY["c_quality_logreg_stream"].fn(spark, SF_SMOKE))
    want = _rows(REGISTRY["c_quality_logreg"].fn(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_profile_counts_accumulate_across_batches(spark):
    base = f"/tmp/dss_logreg_stream/mb_{uuid.uuid4().hex[:8]}"
    shutil.rmtree(base, ignore_errors=True)
    docs = load_table(spark, SF_SMOKE, "documents")
    src = _incdedup_chunked_src(spark, docs, f"{base}/feed", n_chunks=6)
    run_logreg_stream(spark, src, docs.schema, base)
    # six micro-batches committed six snapshots
    assert latest_manifest(f"{base}/cnts")["batch_id"] == 5

    def total(version):
        return (
            spark.read.schema(_LRS_CNT_SCHEMA)
            .json(manifest_files(f"{base}/cnts", version))
            .agg(F.sum("c"))
            .first()[0]
        )

    totals = [total(v) for v in range(1, 7)]
    # strictly monotone state growth; final snapshot == train split
    assert all(a < b for a, b in zip(totals, totals[1:])), totals
    n_train = (
        docs.filter(
            (F.col("doc_id") * 2654435761) % 4294967296 % 100 < 80
        ).count()
    )
    assert totals[-1] == n_train, (totals[-1], n_train)
    # the sufficient statistic is profile-bounded, far below doc count
    final = spark.read.schema(_LRS_CNT_SCHEMA).json(
        manifest_files(f"{base}/cnts")
    )
    n_prof = final.count()
    assert 0 < n_prof < n_train, (n_prof, n_train)
    # y is the micro-quantized label, nothing else
    assert final.filter(~F.col("y").isin(0, 1_000_000)).count() == 0
    shutil.rmtree(base, ignore_errors=True)


def test_profile_replay_equals_doc_batch_weights(spark):
    # The exactness core, isolated from streaming: GD replayed on the
    # cnt-weighted profile table must end at the SAME weight table as
    # the batch query's per-doc loop — checked via the final logits
    # (twin-equality above) AND here via the weights directly, by
    # building profiles from the static corpus (no stream involved).
    from demo_segmenter_spark.operators.layer_c import (
        LR_ETA_DEN,
        LR_ROUNDS,
        _lr_lab,
    )
    from demo_segmenter_spark.functions.cache import local_checkpoint
    from demo_segmenter_spark.operators.layer_c import EPS
    from demo_segmenter_spark.sources import spread

    docs = spread(load_table(spark, SF_SMOKE, "documents"))
    lab = _lr_lab(docs).persist()
    prof = (
        lab.filter("is_train")
        .select(
            F.expr("least(nt, 100) - 20").alias("x2"),
            F.expr("(1000 * nd) DIV nt - 400").alias("x3"),
            F.expr("(1000 * ns) DIV nt - 10").alias("x4"),
            F.when(F.col("label") == "pass", 1_000_000)
            .otherwise(0)
            .cast("long")
            .alias("y"),
        )
        .groupBy("x2", "x3", "x4", "y")
        .agg(F.count("*").cast("long").alias("c"))
    )
    w_prof = {
        r["b"]: r["wm"] for r in _lr_gd_profiles(spark, prof).collect()
    }

    # reference: the batch query's per-doc GD loop, replayed here
    feat = lab.selectExpr(
        "doc_id",
        "stack(4,"
        " CAST(-1 AS BIGINT), CAST(1 AS BIGINT),"
        " CAST(-2 AS BIGINT), least(nt, 100) - 20,"
        " CAST(-3 AS BIGINT), (1000 * nd) DIV nt - 400,"
        " CAST(-4 AS BIGINT), (1000 * ns) DIV nt - 10"
        ") AS (b, xb)",
    ).persist()
    trn = (
        lab.filter("is_train")
        .select(
            "doc_id",
            F.when(F.col("label") == "pass", 1_000_000)
            .otherwise(0)
            .cast("long")
            .alias("y"),
        )
        .persist()
    )
    ntr = trn.agg(F.count("*").alias("ntr"))
    w = spark.range(-4, 0).select(
        F.col("id").alias("b"), F.lit(0).cast("long").alias("wm")
    )
    for _ in range(LR_ROUNDS):
        lm = (
            feat.join(F.broadcast(w), "b")
            .join(trn.select("doc_id"), "doc_id")
            .groupBy("doc_id")
            .agg(F.sum(F.col("xb") * F.col("wm")).alias("lm"))
        )
        pm = lm.select(
            "doc_id",
            F.round(
                F.lit(1000000.0)
                / (F.lit(1.0) + F.exp(-(F.col("lm") / 1000000.0)))
                + F.lit(EPS[0])
            )
            .cast("long")
            .alias("pm"),
        )
        rs = pm.join(trn, "doc_id").select(
            "doc_id", (F.col("y") - F.col("pm")).alias("rr")
        )
        gr = (
            feat.join(rs, "doc_id")
            .groupBy("b")
            .agg(F.sum(F.col("xb") * F.col("rr")).alias("g"))
        )
        w = local_checkpoint(
            w.join(gr, "b", "left")
            .na.fill(0, ["g"])
            .crossJoin(F.broadcast(ntr))
            .select(
                "b",
                F.expr(f"wm + g DIV ({LR_ETA_DEN} * ntr)").alias("wm"),
            )
        )
    w_doc = {r["b"]: r["wm"] for r in w.collect()}
    assert w_prof == w_doc, (w_prof, w_doc)

    # Round-12: the driver-side replay (_lr_gd_local — JVM exp via the
    # gateway, BigDecimal HALF_UP, BIGINT sums, trunc DIV) must land on
    # the SAME weights as the Spark profile replay, closing the chain
    # per-doc loop ≡ Spark profile replay ≡ local replay.
    from demo_segmenter_spark.operators.layer_c import _lr_gd_local

    w_loc = {
        r["b"]: r["wm"]
        for r in _lr_gd_local(
            spark,
            [(r.x2, r.x3, r.x4, r.y, r.c) for r in prof.collect()],
        ).collect()
    }
    assert w_loc == w_prof, (w_loc, w_prof)
    lab.unpersist()
    feat.unpersist()
    trn.unpersist()
