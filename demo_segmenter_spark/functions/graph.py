"""Distributed connected components — the cluster-resolution primitive
behind c_dedup_cluster.

Semantics: given an undirected edge list, every vertex gets
``label = min(vertex id in its component)``.

Two-level algorithm (the standard contraction hybrid):

1. **Local phase** (one Arrow pass, no iteration): partition the edge
   list, run a path-compressed union-find on each partition's edges via
   ``applyInPandas``. This collapses every intra-partition path in one
   step and emits (vertex -> local label).
2. **Contraction**: rewrite each original edge through the local
   labels; drop self-loops and duplicates. The contracted graph has one
   vertex per local component — orders of magnitude smaller (measured
   at sf0.1: 3,670 directed edges -> 280 contracted).
3. **Global phase**: iterate min-label propagation + pointer jumping on
   the contracted graph to a FIXPOINT (labels only decrease, so
   sum(label) is a monotone potential; equal sum == converged). The
   per-round scalar check is Pregel-style halting on tiny checkpointed
   state. ``localCheckpoint`` per round stops the logical plan doubling
   per iteration (without it Catalyst optimization time dominates —
   measured 34s -> ~3s at sf0.01 for the naive single-level loop).
4. Vertices resolve via local label -> global label.

Why not fixed rounds: worst-case chains propagate one hop per round
when ids decrease along the path — 6 fixed rounds left 5 of 447
clusters split at sf0.1. The contraction phase is also why round
count stays low: local union-find eats the long chains that land in
one partition, and at 100 TB the same two-level shape (local CC per
input split, then the small boundary graph — Kiveris et al.,
"Connected Components in MapReduce and Beyond") is the only one that
works when edges don't fit one machine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demo_segmenter_spark.functions.cache import local_checkpoint, persist

MAX_ROUNDS = 64  # safety net; fixpoint check exits far earlier

# Contracted graphs at or below this many (directed) edges are finished
# with a single union-find on the driver instead of Pregel rounds: the
# whole point of the contraction is that the boundary graph is orders
# of magnitude smaller than the input (Kiveris et al. finish small
# residual graphs on one machine for the same reason). 1M edges is
# ~16 MB — trivial to collect, and each avoided fixpoint round is a
# full job of scheduler+shuffle latency.
DRIVER_FINISH_EDGES = 1_000_000

# Graphs at or below this many edges (established by a BOUNDED
# limit-probe, never a full count) get their local phase coalesced to
# ~LOCAL_EDGES_PER_GROUP edges per union-find group: a 3,670-edge
# bench graph then runs ONE applyInPandas task instead of 32 near-empty
# ones, which removes the scheduler-latency variance that dominated its
# timings. Above the probe bound the natural partitioning is kept —
# at 100 TB the local phase must stay one-group-per-input-split.
# Threshold calibration (measured, 875k scrambled edges, warm):
# coalescing to 250k-edge groups cost 5.0 s vs 4.1 s fragmented — the
# single-threaded pandas union-find loses to 64 parallel small groups
# well before 1M edges — so the coalesce only fires where per-group
# work is genuinely smaller than scheduler latency.
SMALL_GRAPH_EDGES = 100_000
LOCAL_EDGES_PER_GROUP = 50_000


def _local_union_find(pdf: pd.DataFrame) -> pd.DataFrame:
    """Path-compressed union-find over one partition's edges."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pdf["a"], pdf["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # union by min id keeps labels canonical-per-partition
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return pd.DataFrame(
        {
            "v": list(parent),
            "label": [find(v) for v in parent],
        }
    )


def connected_components(
    pairs: DataFrame,
    driver_finish_edges: int = DRIVER_FINISH_EDGES,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """``pairs``: two integer columns (a, b), one row per undirected
    edge. Returns (v, label) with label = min vertex id reachable.
    ``driver_finish_edges`` gates the single-machine finish of the
    contracted graph; ``small_graph_edges`` gates the local-phase
    coalesce (tests pass 0 for both to force the fully distributed,
    fully fragmented path)."""
    a_col, b_col = pairs.columns[:2]
    # Tracked persist, not localCheckpoint: checkpoint RDD blocks are
    # invisible to release_persisted(), so a long-lived session (bench,
    # sweep) accumulated them across calls. Lineage truncation is only
    # load-bearing inside the fixpoint LOOP (plan doubles per round);
    # these one-shot intermediates just need compute-once semantics.
    edges0 = persist(pairs.select(
        F.col(a_col).cast("long").alias("a"), F.col(b_col).cast("long").alias("b")
    ))

    # Phase 1: per-partition union-find (group = physical partition).
    # Small graphs (bounded probe — limit(N+1) short-circuits, no full
    # count at scale) coalesce to few large groups: more contraction,
    # fewer tasks, less scheduler jitter.
    grouped_src = edges0
    if small_graph_edges > 0:
        n_probe = edges0.limit(small_graph_edges + 1).count()
        if n_probe <= small_graph_edges:
            grouped_src = edges0.coalesce(
                max(1, -(-n_probe // LOCAL_EDGES_PER_GROUP))
            )
    grouped = grouped_src.withColumn("part", F.spark_partition_id())
    local = grouped.groupBy("part").applyInPandas(
        lambda pdf: _local_union_find(pdf), schema="v long, label long"
    )
    # A vertex can appear in several partitions with different local
    # labels; keeping the min per vertex preserves correctness (the
    # dropped links are re-established through the contracted edges).
    local = persist(local.groupBy("v").agg(F.min("label").alias("label")))

    # Phase 2: contract edges through local labels.
    la = local.select(F.col("v").alias("a"), F.col("label").alias("ca"))
    lb = local.select(F.col("v").alias("b"), F.col("label").alias("cb"))
    contracted = (
        edges0.join(la, "a")
        .join(lb, "b")
        .filter(F.col("ca") != F.col("cb"))
        .select("ca", "cb")
        .distinct()
    )
    cedges = contracted.select(
        F.col("ca").alias("a"), F.col("cb").alias("b")
    ).unionAll(contracted.select(F.col("cb").alias("a"), F.col("ca").alias("b")))
    cedges = persist(cedges)

    # Phase 3: label the (small) contracted graph. Below the driver
    # threshold: one union-find pass over the collected edges — zero
    # distributed rounds. Above it: fixpoint min-label propagation.
    # ONE bounded job decides AND fetches: limit(N+1).collect() replaces
    # the former count() + toPandas() pair (each a full job of
    # scheduler+shuffle latency on a graph that is usually tiny).
    if driver_finish_edges > 0:
        head = cedges.limit(driver_finish_edges + 1).collect()
        if not head:
            # no contracted edges: local labels are already global
            return local.select("v", "label")
        if len(head) <= driver_finish_edges:
            resolved = _local_union_find(
                pd.DataFrame(
                    {"a": [r["a"] for r in head], "b": [r["b"] for r in head]}
                )
            )
            return _resolve(local, pairs.sparkSession.createDataFrame(
                resolved, schema="v long, label long"
            ))

    labels = (
        cedges.select(F.col("a").alias("v")).distinct().withColumn("label", F.col("v"))
    )
    prev_sum = None
    converged = False
    for _ in range(MAX_ROUNDS):
        if labels.rdd.isEmpty():
            converged = True
            break
        neighbor = cedges.join(labels, cedges["a"] == labels["v"]).select(
            F.col("b").alias("v"), "label"
        )
        labels = (
            labels.unionAll(neighbor).groupBy("v").agg(F.min("label").alias("label"))
        )
        l2 = labels.select(F.col("v").alias("lv"), F.col("label").alias("llabel"))
        labels = (
            labels.join(l2, labels["label"] == l2["lv"])
            .select("v", F.col("llabel").alias("label"))
        )
        labels = local_checkpoint(labels, eager=False)
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum

    if not converged:
        # Exhausting the round budget without the monotone potential
        # stabilizing would silently return split components — fail
        # loudly instead (pointer jumping makes this unreachable in
        # practice: depth halves per round, so 64 rounds covers 2^64).
        raise RuntimeError(
            f"connected_components: no fixpoint after {MAX_ROUNDS} rounds "
            f"(last sum(label)={prev_sum})"
        )
    return _resolve(local, labels)


def _resolve(local: DataFrame, labels: DataFrame) -> DataFrame:
    """Phase 4: resolve vertices through local -> global labels."""
    glob = labels.select(F.col("v").alias("label"), F.col("label").alias("glabel"))
    return (
        local.join(glob, "label", "left")
        .select("v", F.coalesce("glabel", "label").alias("label"))
    )
