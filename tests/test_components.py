"""Direct unit tests for connected_components — both the Arrow driver
union-find path and the distributed hash-min label-propagation fallback,
cross-checked against each other and a known partition.
"""

import pytest

from bloom_filters_spark.operators.components import connected_components


def _labels(df):
    return {r["doc_id"]: r["cluster_id"] for r in df.collect()}


@pytest.fixture()
def edge_df(spark):
    def make(pairs):
        if not pairs:
            return spark.createDataFrame([], "id1 long, id2 long")
        return spark.createDataFrame(pairs, "id1 long, id2 long")

    return make


def test_chain_graph_min_label(spark, edge_df):
    # worst case for propagation depth: a 200-node path 0-1-2-...-199
    edges = edge_df([(i, i + 1) for i in range(199)])
    out = _labels(connected_components(edges))
    assert set(out) == set(range(200))
    assert all(v == 0 for v in out.values())


def test_two_components_and_orientation(spark, edge_df):
    # edges in both orientations, duplicate edges, two components
    edges = edge_df([(5, 3), (3, 7), (7, 3), (10, 12), (12, 10), (12, 14)])
    out = _labels(connected_components(edges))
    assert out == {3: 3, 5: 3, 7: 3, 10: 10, 12: 10, 14: 10}


def test_driver_and_labelprop_agree(spark, edge_df):
    import random

    rng = random.Random(7)
    pairs = [(rng.randrange(500), rng.randrange(500)) for _ in range(400)]
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = edge_df(pairs)
    drv = _labels(connected_components(edges, driver_edge_threshold=10**6))
    dist = _labels(connected_components(edges, driver_edge_threshold=0))
    assert drv == dist


def test_empty_edges(spark, edge_df):
    out = connected_components(edge_df([]))
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["doc_id", "cluster_id"]


def test_isolated_vertices_join(spark, edge_df):
    edges = edge_df([(1, 2)])
    verts = spark.createDataFrame([(1,), (2,), (9,)], "doc_id long")
    out = _labels(connected_components(edges, vertices=verts))
    assert out == {1: 1, 2: 1, 9: 9}
    # distributed path gives the same answer
    out2 = _labels(
        connected_components(edges, vertices=verts, driver_edge_threshold=0)
    )
    assert out2 == out
