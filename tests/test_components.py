"""Connected-components unit tests — both physical strategies:
the driver union-find (small graphs) and the distributed alternating
large-star/small-star loop (forced via small_graph_edges=0)."""

import pytest

from pg_iui_ner_api_spark.operators.components import connected_components

STRATS = [pytest.param(2_000_000, id="driver"), pytest.param(0, id="distributed")]


def _cc(spark, edges, small):
    df = spark.createDataFrame(edges, "u long, v long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df, small_graph_edges=small).collect()
    }


@pytest.mark.parametrize("small", STRATS)
def test_two_components(spark, small):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)], small)
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10


@pytest.mark.parametrize("small", STRATS)
def test_chain_converges(spark, small):
    # long path graph: worst case for naive propagation; star algorithm
    # must converge in O(log n) rounds
    n = 64
    got = _cc(spark, [(i, i + 1) for i in range(n)], small)
    assert set(got.values()) == {0}
    assert len(got) == n + 1


@pytest.mark.parametrize("small", STRATS)
def test_duplicate_and_reversed_edges(spark, small):
    got = _cc(spark, [(2, 1), (1, 2), (2, 3), (3, 1), (5, 4)], small)
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == got[5] == 4


@pytest.mark.parametrize("small", STRATS)
def test_hub_star(spark, small):
    # hub with 200 leaves (skew shape)
    got = _cc(spark, [(0, i) for i in range(1, 201)], small)
    assert set(got.values()) == {0}
    assert len(got) == 201


def test_strategies_agree_on_random_graph(spark):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(400)]
    edges = [(u, v) for u, v in edges if u != v]
    a = _cc(spark, edges, 2_000_000)
    b = _cc(spark, edges, 0)
    assert a == b
