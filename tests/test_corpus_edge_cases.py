"""Synthetic edge cases for the corpus-prep operators — shapes the
fixture can't produce: single-token docs, docs shorter than the chunk
window, docs longer than the packing capacity, all-identical corpora."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunking_short_doc_single_partial_chunk(spark):
    from demo_segmenter_spark.operators.layer_c import CHUNK_STRIDE, CHUNK_TOKENS

    toks = F.split(F.col("text"), " ")
    df = _docs(spark, ["a b c", "x"]).select(
        "doc_id",
        toks.alias("t"),
        F.explode(F.sequence(F.lit(1), F.size(toks), F.lit(CHUNK_STRIDE))).alias(
            "start"
        ),
    )
    rows = df.select(
        "doc_id", F.size(F.slice("t", F.col("start"), CHUNK_TOKENS)).alias("n")
    ).collect()
    got = {(r["doc_id"], r["n"]) for r in rows}
    # One chunk per doc, sized at the doc's token count (clamped slice).
    assert got == {(0, 3), (1, 1)}


def test_pack_oversized_doc_gets_own_bins(spark):
    # A doc longer than capacity lands in the bin where its offset
    # starts, and pushes later docs into later bins (contiguous rule).
    cap = 10
    sized = spark.createDataFrame(
        [(1, 4), (2, 25), (3, 4)], "doc_id long, n_tok long"
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = sized.withColumn(
        "bin", F.expr(f"CAST((sum(n_tok) OVER (ORDER BY doc_id "
                      f"ROWS UNBOUNDED PRECEDING) - n_tok) DIV {cap} AS BIGINT)")
    ).collect()
    bins = {r["doc_id"]: r["bin"] for r in binned}
    assert bins == {1: 0, 2: 0, 3: 2}  # doc 3 starts at offset 29 -> bin 2


def test_repetition_degenerate_all_same_token(spark):
    tk = F.split(F.col("text"), " ")
    n = F.size(tk)
    uniq = F.size(F.array_distinct(tk))
    df = _docs(spark, ["w w w w w", "a b c d e"]).select(
        "doc_id", (1.0 - uniq * 1.0 / n).alias("tok_rep")
    )
    got = {r["doc_id"]: round(r["tok_rep"], 3) for r in df.collect()}
    assert got[0] == 0.8  # 1 unique of 5
    assert got[1] == 0.0


def test_exact_dedup_all_identical_keeps_one(spark):
    from pyspark.sql import Window

    docs = _docs(spark, ["same text here"] * 5)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    )
    assert len(kept) == 1 and kept[0]["doc_id"] == 0


def test_interleave_is_epoch_balanced(spark):
    # The evenly-spaced construction's defining property: in any prefix
    # of the schedule, each source holds its share within rounding — at
    # prefix fraction f, |count_s - f*n_s| <= 1 for every source. Also:
    # each source's src_rank sequence appears in order (1,2,3,...).
    from collections import defaultdict

    from demo_segmenter_spark.registry import REGISTRY, load_all_operators
    from tests.conftest import SF_SMOKE

    load_all_operators()

    rows = sorted(
        (r.schedule_pos, r.lang, r.src_rank)
        for r in REGISTRY["c_dataset_interleave"].fn(spark, SF_SMOKE).collect()
    )
    n_by_lang = defaultdict(int)
    for _, lang, _ in rows:
        n_by_lang[lang] += 1
    total = len(rows)
    seen_rank = defaultdict(int)
    counts = defaultdict(int)
    checkpoints = {int(total * f) for f in (0.25, 0.5, 0.75)}
    for i, (_, lang, rank) in enumerate(rows, start=1):
        seen_rank[lang] += 1
        assert rank == seen_rank[lang], (lang, rank, seen_rank[lang])
        counts[lang] += 1
        if i in checkpoints:
            f = i / total
            for s, n in n_by_lang.items():
                assert abs(counts[s] - f * n) <= 1.0 + 1e-9, (
                    i, s, counts[s], f * n,
                )


def test_paragraph_dedup_rewrites_like_python_reference(spark):
    # Planted shared blocks: doc0 owns block A; doc1 = [A, B] loses A
    # and keeps B; doc2 = exact copy of doc0 loses everything (md5 of
    # empty rewrite); partial tail blocks dedup like full ones.
    import hashlib

    from demo_segmenter_spark.operators.layer_c import PARA_BLOCK
    from demo_segmenter_spark.registry import REGISTRY, load_all_operators

    load_all_operators()
    A = " ".join(f"a{i}" for i in range(PARA_BLOCK))
    B = " ".join(f"b{i}" for i in range(PARA_BLOCK))
    tail = "t0 t1 t2"
    texts = [A, f"{A} {B}", A, f"{B} {tail}", f"{B} {tail}"]
    d = "/tmp/dss_prop/para_dedup"
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    # pure-Python reference
    first = {}
    blocks = {}
    for did, t in enumerate(texts):
        w = t.split(" ")
        blocks[did] = [
            " ".join(w[i : i + PARA_BLOCK])
            for i in range(0, len(w), PARA_BLOCK)
        ]
        for bi, bt in enumerate(blocks[did]):
            first.setdefault(bt, (did, bi))
    want = {}
    for did, bl in blocks.items():
        keptb = [bt for bi, bt in enumerate(bl) if first[bt] == (did, bi)]
        want[did] = (
            len(bl),
            len(keptb),
            sum(len(bt.split(" ")) for bt in keptb),
            hashlib.md5(" ".join(keptb).encode()).hexdigest(),
        )

    got = {
        r.doc_id: (r.n_blocks, r.n_kept, r.kept_words, r.scrubbed_md5)
        for r in REGISTRY["c_dedup_paragraph"].fn(spark, d).collect()
    }
    assert got == want, (got, want)
    assert got[2][1] == 0 and got[2][3] == hashlib.md5(b"").hexdigest()


def test_span_corruption_matches_python_reference(spark):
    # Rebuild the exact input/target strings in pure Python with the
    # same md5-digit Bernoulli rule and compare md5s byte-for-byte,
    # including a doc whose every token masks (empty-ish input of one
    # sentinel, full target) if the draw produces one.
    import hashlib

    from demo_segmenter_spark.registry import REGISTRY, load_all_operators

    load_all_operators()
    texts = [
        " ".join(f"w{i}" for i in range(25)),
        "single",
        " ".join(f"v{i}" for i in range(7)),
    ]
    d = "/tmp/dss_prop/span_corr"
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    want = {}
    for did, t in enumerate(texts):
        toks = t.split(" ")
        masked = [
            hashlib.md5(f"sc42:{did}:{p}".encode()).hexdigest()[0] in "012"
            for p in range(1, len(toks) + 1)
        ]
        inp, tgt, run = [], [], 0
        for i, (tk, mk) in enumerate(zip(toks, masked)):
            start = mk and (i == 0 or not masked[i - 1])
            if start:
                run += 1
                inp.append(f"<extra_id_{run}>")
                tgt.append(f"<extra_id_{run}>")
            if mk:
                tgt.append(tk)
            else:
                inp.append(tk)
        want[did] = (
            len(toks),
            sum(masked),
            run,
            hashlib.md5(" ".join(inp).encode()).hexdigest(),
            hashlib.md5(" ".join(tgt).encode()).hexdigest(),
        )
    got = {
        r.doc_id: (r.n_tokens, r.n_masked, r.n_spans, r.input_md5, r.target_md5)
        for r in REGISTRY["c_span_corruption"].fn(spark, d).collect()
    }
    assert got == want, (got, want)
