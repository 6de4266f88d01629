"""Connected-components (large-star/small-star) unit tests."""

from pg_iui_ner_api_spark.operators.components import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long")
    return {r["node"]: r["component"] for r in connected_components(df).collect()}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10


def test_chain_converges(spark):
    # long path graph: worst case for naive propagation; star algorithm
    # must converge in O(log n) rounds
    n = 64
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_duplicate_and_reversed_edges(spark):
    got = _cc(spark, [(2, 1), (1, 2), (2, 3), (3, 1), (5, 4)])
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == got[5] == 4


def test_hub_star(spark):
    # hub with 200 leaves (skew shape)
    got = _cc(spark, [(0, i) for i in range(1, 201)])
    assert set(got.values()) == {0}
    assert len(got) == 201
