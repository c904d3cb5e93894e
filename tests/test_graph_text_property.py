"""Independent-implementation property tests for the round-5 additions
with nontrivial combinatorial semantics: c_token_bpe (greedy
non-overlapping merges with total-order argmax ties) and
b_graph_triangles (degree-ordered orientation with (degree, id) ties).
Random corpora/graphs over tiny domains force the edge cases the
fixture never hits — overlap runs, argmax ties, equal-degree
orientation — and a pure-Python reference recomputes the exact
expected output."""

from __future__ import annotations

import os
import random
import uuid
from collections import Counter

from demo_segmenter_spark.registry import REGISTRY, load_all_operators

load_all_operators()


# --------------------------- BPE reference ---------------------------


def _bpe_reference(docs: dict[int, str], rounds: int = 2):
    seqs = {d: t.split(" ") for d, t in docs.items()}
    out = []
    for r in range(1, rounds + 1):
        cnt = Counter()
        for s in seqs.values():
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += 1
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges = 0
        for d, s in seqs.items():
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + "_" + b)
                    merges += 1
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            seqs[d] = ns
        out.append((r, a, b, c, merges, a + "_" + b))
    return out


def _write_docs(spark, docs: dict[int, str]) -> str:
    d = f"/tmp/dss_prop/{uuid.uuid4().hex[:8]}"
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(i, t, "en", "prop", len(t)) for i, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_bpe_matches_python_reference(spark):
    rng = random.Random(11)
    for trial in range(3):
        # 2-letter alphabet with doubled letters: rich in a==b argmax
        # pairs, overlap runs, and count ties
        vocab = ["a", "b", "aa"]
        docs = {
            d: " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 18)))
            for d in range(12)
        }
        want = _bpe_reference(docs)
        sf = _write_docs(spark, docs)
        got = sorted(
            tuple(r) for r in REGISTRY["c_token_bpe"].fn(spark, sf).collect()
        )
        assert got == sorted(want), (trial, got, want)


# ------------------------- triangle reference ------------------------


def _triangle_reference(rows, min_qty=40, top=20):
    op = {(o, p) for o, p, q in rows if q >= min_qty}
    from collections import defaultdict

    by_order = defaultdict(set)
    for o, p in op:
        by_order[o].add(p)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                edges.add((u, v))
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri_count = Counter()
    for u, v in edges:
        for w in adj[u] & adj[v]:
            if w > v:  # count each triangle once (u < v < w by id)
                if u < v < w:
                    tri_count[u] += 1
                    tri_count[v] += 1
                    tri_count[w] += 1
    ranked = sorted(tri_count.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    return [(node, cnt) for node, cnt in ranked]


def _write_lineitem(spark, rows) -> str:
    d = f"/tmp/dss_prop/{uuid.uuid4().hex[:8]}"
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(o, p, float(q)) for o, p, q in rows],
        "l_orderkey long, l_partkey long, l_quantity double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    return d


def test_triangles_match_python_reference(spark):
    rng = random.Random(23)
    for trial in range(3):
        # dense tiny graph: 12 parts, 40 orders x up to 5 parts ->
        # plenty of triangles and MANY equal-degree orientation ties
        rows = []
        for o in range(40):
            for p in rng.sample(range(12), rng.randint(1, 5)):
                rows.append((o, p, rng.choice([10, 45, 50])))
        want = _triangle_reference(rows)
        sf = _write_lineitem(spark, rows)
        got = [
            (r.node, r.n_triangles)
            for r in REGISTRY["b_graph_triangles"].fn(spark, sf).collect()
        ]
        assert got == want, (trial, got, want)
