"""c_mix_doremi (round-10): third-implementation check — a pure-python
replay of the multiplicative-weights iteration (counts from DuckDB,
arithmetic in plain ints/floats following the documented quantization
order) must reproduce every emitted column exactly, and the dynamic
must actually move weight toward under-served domains."""

from __future__ import annotations

import math

import duckdb

from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def _py_doremi(sf_dir, rounds=3):
    con = duckdb.connect()
    dcnt = con.execute(
        f"""
        SELECT source, t, count(*) AS ckt FROM (
            SELECT source, unnest(string_split(text, ' ')) AS t
            FROM read_parquet('{sf_dir}/documents.parquet')
        ) GROUP BY source, t
        """
    ).fetchall()
    tk = {}
    for s, _, c in dcnt:
        tk[s] = tk.get(s, 0) + c
    K = len(tk)
    am = {s: 1_000_000 // K for s in tk}
    rows = []
    for r in range(1, rounds + 1):
        pm = {}
        for s, t, c in dcnt:
            tp = int(round(am[s] * c * 1.0 / tk[s] * 1_000_000 + 1e-04))
            pm[t] = pm.get(t, 0) + tp
        lp = {
            t: int(round(math.log(v / 1e12) * 1_000_000 + 1e-04))
            for t, v in pm.items()
        }
        ln_num = {s: 0 for s in tk}
        for s, t, c in dcnt:
            ln_num[s] += -c * lp[t]
        lmic = {
            s: int(round(ln_num[s] * 1.0 / tk[s] + 1e-04)) for s in tk
        }
        fmic = {
            s: int(round(math.exp(lmic[s] / 1e7) * 1_000_000 + 1e-04))
            for s in tk
        }
        raw = {s: am[s] * fmic[s] for s in tk}
        sr = sum(raw.values())
        am = {
            s: (9 * int(round(raw[s] * 1.0 / sr * 1_000_000 + 1e-04))) // 10
            + 100_000 // K
            for s in tk
        }
        for s in tk:
            rows.append((r, s, tk[s], lmic[s], fmic[s], am[s]))
    return sorted(rows)


def test_spark_matches_python_reference(spark):
    got = sorted(
        tuple(r)
        for r in REGISTRY["c_mix_doremi"].fn(spark, SF_SMOKE).collect()
    )
    assert got == _py_doremi(SF_SMOKE)
    assert len(got) > 0


def test_weight_moves_toward_underserved_domains(spark):
    rows = REGISTRY["c_mix_doremi"].fn(spark, SF_SMOKE).collect()
    by_round = {}
    for r in rows:
        by_round.setdefault(r["round"], []).append(r)
    last = max(by_round)
    # within every round, the highest-loss domain must end with a
    # weight >= the lowest-loss domain's (multiplicative weights)
    for r, rs in by_round.items():
        hi = max(rs, key=lambda x: (x["loss_micro"], x["source"]))
        lo = min(rs, key=lambda x: (x["loss_micro"], x["source"]))
        assert hi["alpha_micro"] >= lo["alpha_micro"]
    # and the spread grows from round 1 to the final round: the
    # iteration is actually iterating, not a fixed point from step 1
    def spread(rs):
        a = [x["alpha_micro"] for x in rs]
        return max(a) - min(a)

    assert spread(by_round[last]) > spread(by_round[1])


def test_maxsim_reranks_within_bm25_pool(spark):
    """c_rag_maxsim (round-10): late interaction must (a) score exactly
    the BM25 top-MAXSIM_POOL candidate set — never the whole corpus —
    (b) produce a dense 1..N permutation as rank, and (c) actually
    re-rank (the MaxSim order differs from the BM25 order on the
    fixture, i.e. the second stage is not a no-op)."""
    from demo_segmenter_spark.operators.layer_c import MAXSIM_POOL

    rows = REGISTRY["c_rag_maxsim"].fn(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= MAXSIM_POOL
    assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
    bm_order = [
        r["doc_id"]
        for r in sorted(rows, key=lambda r: (-r["bm25_micro"], r["doc_id"]))
    ]
    ms_order = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert bm_order != ms_order
    assert all(r["n_chunks"] >= 1 for r in rows)


def test_bloom_has_no_false_negatives_and_gates_the_join(spark):
    """c_dedup_bloom: every TRUE duplicate must be a bloom hit (the
    no-false-negative guarantee the pre-filter's correctness rests
    on), fp bookkeeping must be consistent, and the filter must
    actually gate — definitely-new docs outnumber hits on the
    fixture."""
    import duckdb

    rows = REGISTRY["c_dedup_bloom"].fn(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        if r["is_dup"]:
            assert r["bloom_hit"] == 1  # no false negatives, ever
        assert r["is_fp"] == int(r["bloom_hit"] == 1 and r["is_dup"] == 0)
    # independent truth: exact cross-split dup set from DuckDB
    truth = {
        d
        for (d,) in duckdb.sql(
            f"""
            SELECT i.doc_id
            FROM read_parquet('{SF_SMOKE}/documents.parquet') i
            JOIN read_parquet('{SF_SMOKE}/documents.parquet') c
              ON md5(i.text) = md5(c.text)
             AND i.doc_id % 3 = 2 AND c.doc_id % 3 <> 2
            """
        ).fetchall()
    }
    assert {r["doc_id"] for r in rows if r["is_dup"]} == truth
    n_hits = sum(r["bloom_hit"] for r in rows)
    assert n_hits < len(rows)  # the pre-filter prunes the join input
