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


# ---------------------------------------------------------------------------
# Prefix-filtered exact set-similarity self-join (AllPairs/PPJoin shape)
# ---------------------------------------------------------------------------
def _brute_jaccard(rows, threshold, n=None):
    """Independent per-pair brute force over python sets."""
    import itertools
    import re

    def items(text):
        toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
        if n is None:
            return set(toks)
        if len(toks) <= n:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    sets = {i: items(t) for i, t in rows}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= threshold:
            out[(a, b)] = round(inter / union, 6)
    return out


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_setsim_token_mode_exact_vs_brute_force(spark):
    from pg_iui_ner_api_spark.operators.similarity import setsim_self_join

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox leaps over the lazy dog"),
        (3, "a completely different sentence with other words"),
        (4, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (5, "quick brown fox dog"),                            # subset of 1
        (6, "  The   QUICK brown fox jumps over the lazy dog"),  # ws/case
        (7, "singleton"),
    ]
    got = {
        (r["da"], r["db"]): r["jaccard"]
        for r in setsim_self_join(_docs(spark, rows), threshold=0.5).collect()
    }
    assert got == _brute_jaccard(rows, 0.5)


def test_setsim_shingle_mode_matches_ngram_jaccard_semantics(spark):
    """Same semantics, three independent algorithms: prefix-filter join
    == df-capped shingle self-join == python brute force."""
    from pg_iui_ner_api_spark.operators.dedup import ngram_jaccard_pairs
    from pg_iui_ner_api_spark.operators.similarity import setsim_self_join

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "one two three four five six seven eight nine"),
        (4, "one two three four five six seven eight nine"),
        (5, "short doc"),
        (6, "alpha beta gamma delta epsilon zeta eta theta"),
    ]
    df = _docs(spark, rows)
    pf = {
        (r["da"], r["db"]): r["jaccard"]
        for r in setsim_self_join(df, threshold=0.3, n=3).collect()
    }
    ng = {
        (r["da"], r["db"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, n=3, threshold=0.3).collect()
    }
    assert pf == ng == _brute_jaccard(rows, 0.3, n=3)


def test_setsim_recall_is_total_under_adversarial_frequencies(spark):
    """Hub-token-heavy corpus: every token of some docs is frequent, so
    prefixes are all hub tokens — the prefix-filter theorem must still
    find every qualifying pair (no df_cap, no silent drop)."""
    from pg_iui_ner_api_spark.operators.similarity import setsim_self_join

    common = "x1 x2 x3 x4 x5 x6 x7 x8 x9"
    rows = [(i, common) for i in range(1, 21)]  # 20 identical hub docs
    rows += [(100, common + " rare100"), (101, common + " rare101")]
    got = {
        (r["da"], r["db"]): r["jaccard"]
        for r in setsim_self_join(_docs(spark, rows), threshold=0.8).collect()
    }
    assert got == _brute_jaccard(rows, 0.8)
    # the 20 identical docs alone contribute C(20,2)=190 pairs at 1.0
    assert sum(1 for v in got.values() if v == 1.0) >= 190


# ---------------------------------------------------------------------------
# sorted-neighborhood blocking
# ---------------------------------------------------------------------------
def _snm_brute(rows, window):
    order = sorted((k, i) for i, k in rows if k is not None)
    out = []
    for a in range(len(order)):
        for b in range(a + 1, min(a + window + 1, len(order))):
            out.append((order[a][1], order[b][1], b - a))
    return sorted(out)


def test_snm_pairs_match_brute_force(spark):
    from pg_iui_ner_api_spark.operators.similarity import sorted_neighborhood_pairs

    rows = [(i, f"key{(i * 37) % 50:03d}") for i in range(200)] + [(900, None)]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    got = sorted(
        (r["ida"], r["idb"], r["gap"])
        for r in sorted_neighborhood_pairs(df, "k", "doc_id", window=4).collect()
    )
    assert got == _snm_brute(rows, 4)
    assert len(got) > 0


def test_snm_pairs_partitioning_invariant(spark):
    from pg_iui_ner_api_spark.operators.similarity import sorted_neighborhood_pairs

    rows = [(i, f"z{(i * 13) % 37:02d}") for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    a = sorted(
        tuple(r)
        for r in sorted_neighborhood_pairs(df, "k", "doc_id", window=3).collect()
    )
    b = sorted(
        tuple(r)
        for r in sorted_neighborhood_pairs(
            df.repartition(11), "k", "doc_id", window=3, partitions=5
        ).collect()
    )
    assert a == b == _snm_brute(rows, 3)


def test_snm_window_one_is_adjacent_only(spark):
    from pg_iui_ner_api_spark.operators.similarity import sorted_neighborhood_pairs

    rows = [(1, "a"), (2, "b"), (3, "c")]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    got = sorted(
        tuple(r)
        for r in sorted_neighborhood_pairs(df, "k", "doc_id", window=1).collect()
    )
    assert got == [(1, 2, 1), (2, 3, 1)]


# ---------------------------------------------------------------------------
# asymmetric containment join (SSJoin containment prefix filter)
# ---------------------------------------------------------------------------
def test_containment_hand_case(spark):
    from pg_iui_ner_api_spark.operators.similarity import containment_join

    docs = spark.createDataFrame(
        [("d0", "a b c d e f g h"), ("d1", "c d e f"), ("d2", "x y z w q")],
        "doc_id string, text string",
    )
    got = sorted(tuple(r) for r in containment_join(docs, 0.8, n=None).collect())
    # d1 fully contained in d0; the reverse direction is 4/8 = 0.5 < 0.8
    assert got == [("d1", "d0", 1.0)]


def test_containment_exact_vs_brute_force(spark):
    import itertools
    import random

    from pg_iui_ner_api_spark.operators.similarity import containment_join

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(40)]
    rows = [(f"d{i}", " ".join(rng.sample(vocab, rng.randrange(3, 15))))
            for i in range(60)]
    sets = {i: set(t.split()) for i, t in rows}
    want = sorted(
        (a, b, round(len(sets[a] & sets[b]) / len(sets[a]), 6))
        for a, b in itertools.permutations(sets, 2)
        if len(sets[a] & sets[b]) / len(sets[a]) >= 0.6
    )
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    for reparted in (docs.coalesce(1), docs.repartition(7)):
        got = sorted(
            tuple(r)
            for r in containment_join(reparted, 0.6, n=None).collect()
        )
        assert got == want and got


def test_containment_bad_threshold(spark):
    import pytest as _pytest

    from pg_iui_ner_api_spark.operators.similarity import containment_join

    docs = spark.createDataFrame([("d0", "a b")], "doc_id string, text string")
    with _pytest.raises(ValueError):
        containment_join(docs, 0.0)
    with _pytest.raises(ValueError):
        containment_join(docs, 1.5)
