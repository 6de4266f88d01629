"""Salted blocked self-join tests (J4): connectivity preserved under
salting, pair completeness for small blocks, no silent truncation."""

from pyspark.sql import functions as F

from pg_iui_ner_api_spark.operators.components import connected_components
from pg_iui_ner_api_spark.operators.similarity import (
    blocked_pair_edges,
    salted_block_edges,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "block string, id string")


def test_salted_edges_keep_blocks_connected(spark):
    rows = [("hub", f"m{i}") for i in range(500)] + [("tiny", "a"), ("tiny", "b")]
    edges = salted_block_edges(_df(spark, rows), "block", "id",
                               salt=8, hub_threshold=100)
    comp = connected_components(edges)
    # join back components per block
    ids = _df(spark, rows).select(
        "block", F.xxhash64("id").alias("node")
    )
    got = ids.join(comp, "node", "left").select("block", "component").distinct()
    per_block = {r["block"]: 0 for r in got.collect()}
    for r in got.groupBy("block").count().collect():
        per_block[r["block"]] = r["count"]
    assert per_block["hub"] == 1, "salting must not split the hub block"
    assert per_block["tiny"] == 1


def test_salted_edges_bound_fanin(spark):
    rows = [("hub", f"m{i}") for i in range(1000)]
    edges = salted_block_edges(_df(spark, rows), "block", "id",
                               salt=16, hub_threshold=100)
    # max fan-in on any single node ~ block/salt + salt bridges, far
    # below the unsalted 999
    fanin = edges.groupBy("v").count().agg(F.max("count")).collect()[0][0]
    assert fanin < 1000 / 16 + 32


def test_blocked_pairs_complete_and_reported(spark):
    rows = [("x", "a"), ("x", "b"), ("x", "c"), ("big", "p"), ("big", "q"), ("big", "r"), ("big", "s")]
    pairs, dropped = blocked_pair_edges(_df(spark, rows), "block", "id", max_block=3)
    got = {(r["ida"], r["idb"]) for r in pairs.collect()}
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}
    d = dropped.collect()
    assert len(d) == 1 and d[0]["b"] == "big" and d[0]["n"] == 4


def test_edit_distance_pairs_recall_vs_brute_force(spark):
    """Deletion-neighborhood join must find EXACTLY the brute-force
    levenshtein<=1 pairs (complete cover => recall 1.0)."""
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    names = ["acme", "acmee", "acne", "ace", "zenith", "zenit", "zzz",
             "", "a", "b", "ab"]
    rows = [(i, s) for i, s in enumerate(names)]
    df = spark.createDataFrame(rows, "id long, s string")
    from pg_iui_ner_api_spark.operators.similarity import edit_distance_pairs

    got = {(r["lid"], r["rid"]): r["dist"]
           for r in edit_distance_pairs(df, df, "s", "s", "id", "id").collect()
           if r["lid"] < r["rid"]}
    want = {(a, b): lev(names[a], names[b])
            for a, b in itertools.combinations(range(len(names)), 2)
            if lev(names[a], names[b]) <= 1}
    assert got == want
    assert want  # non-trivial: some distance-1 pairs exist


def test_edit_distance_pairs_rejects_deeper_radius(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    from pg_iui_ner_api_spark.operators.similarity import edit_distance_pairs

    import pytest as _pt
    with _pt.raises(ValueError):
        edit_distance_pairs(df, df, "s", "s", "id", "id", max_dist=2)
