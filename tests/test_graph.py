"""connected_components correctness on adversarial shapes the fixture
graph can't exercise: worst-case label ordering (ids DECREASING along a
path — plain k-round min-propagation moves the min one hop per round),
star, cycle, and singletons-with-one-edge mixtures.

Every shape runs through BOTH phase-3 strategies: the driver-side
union-find finish (production default for small contracted graphs) and
the distributed fixpoint loop (forced via driver_finish_edges=0)."""

from __future__ import annotations

import pytest

from demo_segmenter_spark.functions.graph import connected_components

# (driver_finish_edges, small_graph_edges) pairs covering all three
# phase-3 strategies:
# - coalesced: the production default for small graphs — the coalesced
#   local phase solves everything, contraction is empty, early return;
# - driver-fragmented: local phase left fragmented (no coalesce), the
#   contracted graph is finished by the driver-side union-find;
# - distributed: both off — the fixpoint loop must do the work.
@pytest.fixture(
    params=[(10**9, 10**9), (10**9, 0), (0, 0)],
    ids=["coalesced", "driver-fragmented", "distributed"],
)
def finish_threshold(request):
    return request.param


def _components(spark, edge_list, finish_threshold=(10**9, 10**9)):
    df = spark.createDataFrame(edge_list, "a long, b long")
    driver_edges, small_edges = finish_threshold
    rows = connected_components(
        df, driver_finish_edges=driver_edges, small_graph_edges=small_edges
    ).collect()
    return {int(r["v"]): int(r["label"]) for r in rows}


def test_decreasing_id_path(spark, finish_threshold):
    # Path 100-99-...-1: min label (1) sits at the far end from the
    # highest id. Fixpoint iteration must still collapse to one
    # component labeled 1.
    edges = [(i, i - 1) for i in range(100, 1, -1)]
    labels = _components(spark, edges, finish_threshold)
    assert set(labels) == set(range(1, 101))
    assert set(labels.values()) == {1}


def test_two_components_and_cycle(spark, finish_threshold):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12)]
    labels = _components(spark, edges, finish_threshold)
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[10] == labels[11] == labels[12] == 10


def test_star_graph(spark, finish_threshold):
    center = 50
    edges = [(center, i) for i in range(1, 20)]
    labels = _components(spark, edges, finish_threshold)
    assert set(labels.values()) == {1}
    assert len(labels) == 20


def _union_find_truth(edges):
    """Independent reference: path-compressed union-find."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min id in component: min-root after full pathing
    labels = {}
    for v in list(parent):
        r = find(v)
        labels.setdefault(r, r)
        labels[v] = r
    # roots may not be minimal ids under arbitrary union order; normalize
    comp = {}
    for v, r in labels.items():
        comp.setdefault(r, []).append(v)
    out = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def test_random_graphs_match_union_find(spark, finish_threshold):
    # Deterministic pseudo-random edge lists across densities — an
    # independent-implementation check (same idea as the sessionization
    # property test): Spark's distributed CC must agree with a
    # path-compressed union-find on every graph.
    import random

    rng = random.Random(42)
    for trial in range(6):
        n = rng.randint(5, 40)
        m = rng.randint(1, 2 * n)
        edges = [
            (rng.randint(1, n), rng.randint(1, n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        got = _components(spark, edges, finish_threshold)
        want = _union_find_truth(edges)
        assert got == want, f"trial {trial}: {got} != {want}"
