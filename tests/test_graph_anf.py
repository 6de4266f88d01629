"""Neighborhood function (ANF): hand-checked path/star graphs, a
brute-force BFS reference on an irregular graph, degenerate inputs,
and the bitmap-mode size gate."""

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.operators.graph import (
    neighborhood_function,
    symmetrize,
)


def _sym(spark, pairs):
    return symmetrize(spark.createDataFrame(pairs, "src long, dst long"))


def _collect(df):
    return {(r["node"], r["h"]): r["reach"] for r in df.collect()}


def test_path_graph(spark):
    got = _collect(neighborhood_function(_sym(spark, [(i, i + 1) for i in range(4)]), h=2))
    expect = {(i, 0): 1 for i in range(5)}
    expect.update({(0, 1): 2, (1, 1): 3, (2, 1): 3, (3, 1): 3, (4, 1): 2})
    expect.update({(0, 2): 3, (1, 2): 4, (2, 2): 5, (3, 2): 4, (4, 2): 3})
    assert got == expect


def test_star_graph(spark):
    # hub 0 with 6 leaves: hub reaches all at h=1; leaves need h=2
    got = _collect(neighborhood_function(_sym(spark, [(0, i) for i in range(1, 7)]), h=2))
    assert got[(0, 1)] == 7
    for leaf in range(1, 7):
        assert got[(leaf, 1)] == 2
        assert got[(leaf, 2)] == 7


def test_brute_force_reference(spark):
    pairs = [(i, (i * i + 3) % 23) for i in range(23) if i != (i * i + 3) % 23]
    H = 3
    got = _collect(neighborhood_function(_sym(spark, pairs), h=H))
    # python BFS per node
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v in adj:
        dist = {v: 0}
        frontier = {v}
        for d in range(1, H + 1):
            frontier = {
                u for f in frontier for u in adj[f] if u not in dist
            }
            for u in frontier:
                dist[u] = d
        for r in range(H + 1):
            assert got[(v, r)] == sum(1 for d in dist.values() if d <= r)


def test_disconnected_components_stay_separate(spark):
    got = _collect(
        neighborhood_function(_sym(spark, [(0, 1), (10, 11), (11, 12)]), h=5)
    )
    assert got[(0, 5)] == 2 and got[(1, 5)] == 2
    assert got[(10, 5)] == 3 and got[(12, 5)] == 3


def test_h_zero_and_empty(spark):
    got = _collect(neighborhood_function(_sym(spark, [(0, 1)]), h=0))
    assert got == {(0, 0): 1, (1, 0): 1}
    empty = spark.createDataFrame([], "src long, dst long")
    assert neighborhood_function(empty, h=2).count() == 0
    with pytest.raises(ValueError):
        neighborhood_function(empty, h=-1)


def test_exact_mode_size_gate(spark):
    with pytest.raises(ValueError, match="exact bitmap mode caps"):
        neighborhood_function(
            _sym(spark, [(i, i + 1) for i in range(9)]), h=1, exact_max_nodes=5
        )


def test_partitioning_invariance(spark):
    pairs = [(i, (i + 7) % 19) for i in range(19)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    a = _collect(neighborhood_function(symmetrize(df.repartition(1)), h=2))
    b = _collect(neighborhood_function(symmetrize(df.repartition(11, "dst")), h=2))
    assert a == b


def test_harmonic_centrality_path(spark):
    from pg_iui_ner_api_spark.operators.graph import harmonic_centrality

    # path 0-1-2-3-4, h=2: centrality = (#dist1)/1 + (#dist2)/2
    got = {
        r["node"]: r["harmonic"]
        for r in harmonic_centrality(_sym(spark, [(i, i + 1) for i in range(4)]), h=2).collect()
    }
    assert got == {0: 1.5, 1: 2.5, 2: 3.0, 3: 2.5, 4: 1.5}
    with pytest.raises(ValueError):
        harmonic_centrality(_sym(spark, [(0, 1)]), h=0)


def test_harmonic_matches_bfs_reference(spark):
    from pg_iui_ner_api_spark.operators.graph import harmonic_centrality

    pairs = [(i, (i * i + 3) % 23) for i in range(23) if i != (i * i + 3) % 23]
    H = 3
    got = {
        r["node"]: r["harmonic"]
        for r in harmonic_centrality(_sym(spark, pairs), h=H).collect()
    }
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v in adj:
        dist = {v: 0}
        frontier = {v}
        for d in range(1, H + 1):
            frontier = {u for f in frontier for u in adj[f] if u not in dist}
            for u in frontier:
                dist[u] = d
        want = sum(1.0 / d for d in dist.values() if d >= 1)
        assert got[v] == pytest.approx(round(want, 6), abs=2e-6)
