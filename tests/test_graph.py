"""connected_components correctness on adversarial shapes the fixture
graph can't exercise: worst-case label ordering (ids DECREASING along a
path — plain k-round min-propagation moves the min one hop per round),
star, cycle, and singletons-with-one-edge mixtures."""

from __future__ import annotations

from demo_segmenter_spark.functions.graph import connected_components


def _components(spark, edge_list):
    df = spark.createDataFrame(edge_list, "a long, b long")
    rows = connected_components(df).collect()
    return {int(r["v"]): int(r["label"]) for r in rows}


def test_decreasing_id_path(spark):
    # Path 100-99-...-1: min label (1) sits at the far end from the
    # highest id. Fixpoint iteration must still collapse to one
    # component labeled 1.
    edges = [(i, i - 1) for i in range(100, 1, -1)]
    labels = _components(spark, edges)
    assert set(labels) == set(range(1, 101))
    assert set(labels.values()) == {1}


def test_two_components_and_cycle(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12)]
    labels = _components(spark, edges)
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[10] == labels[11] == labels[12] == 10


def test_star_graph(spark):
    center = 50
    edges = [(center, i) for i in range(1, 20)]
    labels = _components(spark, edges)
    assert set(labels.values()) == {1}
    assert len(labels) == 20
