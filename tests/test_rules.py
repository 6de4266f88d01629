"""AMIE-lite rule mining vs a brute-force pure-Python oracle.

The oracle enumerates every grounded 2-atom path and every head triple
by hand (dicts + sets), so any divergence in the DataFrame algebra —
distinct semantics, cap semantics, ratio rounding, anti-join — fails
loudly on a graph small enough to eyeball.
"""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.operators.rules import (
    mine_path_rules,
    predict_edges,
    rule_mid_dropped,
)

# A little two-ontology KG: people live in cities, cities sit in
# countries, and (for most people) the redundant lives_in_country edge
# is asserted — the classic AMIE example. 'dup' rows exercise the
# distinct contract.
TRIPLES = [
    ("alice", "lives_in", "paris"),
    ("alice", "lives_in", "paris"),  # dup: must not change any count
    ("bob", "lives_in", "paris"),
    ("carol", "lives_in", "lyon"),
    ("dave", "lives_in", "berlin"),
    ("paris", "city_of", "france"),
    ("lyon", "city_of", "france"),
    ("berlin", "city_of", "germany"),
    ("alice", "lives_in_country", "france"),
    ("bob", "lives_in_country", "france"),
    ("carol", "lives_in_country", "france"),
    # dave's lives_in_country edge is MISSING -> predict_edges target
    ("alice", "works_for", "acme"),
    ("bob", "works_for", "acme"),
    ("acme", "based_in", "france"),
]


def brute_rules(triples, min_support, min_conf, cap=None):
    t = sorted(set(triples))
    deg = defaultdict(int)
    for s, _, o in t:
        deg[s] += 1
        deg[o] += 1
    by_s = defaultdict(list)
    for s, p, o in t:
        by_s[s].append((p, o))
    body = defaultdict(set)  # (p1,p2) -> {(x,y)}
    for x, p1, z in t:
        if cap is not None and deg[z] > cap:
            continue
        for p2, y in by_s.get(z, ()):
            body[(p1, p2)].add((x, y))
    heads = defaultdict(set)  # p -> {(s,o)}
    for s, p, o in t:
        heads[p].add((s, o))
    out = {}
    for (p1, p2), pairs in body.items():
        for head, hp in heads.items():
            sup = len(pairs & hp)
            conf = round(sup / len(pairs), 6)
            if sup >= min_support and conf >= min_conf:
                out[(p1, p2, head)] = (
                    sup, len(pairs), len(hp), conf, round(sup / len(hp), 6)
                )
    return out


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])


def _rules_map(df):
    return {
        (r.p1, r.p2, r.head): (
            r.support, r.n_body, r.n_head, r.confidence, r.head_coverage
        )
        for r in df.collect()
    }


def test_rules_match_bruteforce(spark, tdf):
    got = _rules_map(mine_path_rules(tdf, min_support=1, min_conf=0.0))
    want = brute_rules(TRIPLES, 1, 0.0)
    assert got == want
    # and the flagship rule is found with the right numbers:
    # lives_in(x,z) & city_of(z,y) => lives_in_country(x,y)
    # body pairs: alice/bob/carol->france, dave->germany (4)
    # asserted heads: alice, bob, carol (3 of 4)
    sup, n_body, n_head, conf, hc = got[("lives_in", "city_of", "lives_in_country")]
    assert (sup, n_body, n_head) == (3, 4, 3)
    assert conf == 0.75 and hc == 1.0


def test_thresholds_filter(spark, tdf):
    got = _rules_map(mine_path_rules(tdf, min_support=3, min_conf=0.5))
    want = brute_rules(TRIPLES, 3, 0.5)
    assert got == want
    assert all(v[0] >= 3 and v[3] >= 0.5 for v in got.values())
    assert ("lives_in", "city_of", "lives_in_country") in got


def test_mid_cap_and_report(spark, tdf):
    # paris has distinct-edge degree 3 (2 in + 1 out): cap 2 drops it as
    # a pivot, killing alice/bob's grounded paths but keeping
    # lyon/berlin's (degree 2 each)
    got = _rules_map(
        mine_path_rules(tdf, min_support=1, min_conf=0.0, max_mid_degree=2)
    )
    want = brute_rules(TRIPLES, 1, 0.0, cap=2)
    assert got == want
    sup, n_body, _, conf, _ = got[("lives_in", "city_of", "lives_in_country")]
    assert (sup, n_body) == (1, 2)  # carol kept, dave unmatched
    dropped = {
        (r.node, r.degree) for r in rule_mid_dropped(tdf, 2).collect()
    }
    assert dropped == {
        ("alice", 3), ("bob", 3), ("paris", 3), ("france", 6), ("acme", 3)
    }


def test_predict_edges_completion(spark, tdf):
    rules = mine_path_rules(tdf, min_support=1, min_conf=0.5)
    pred = {
        (r.subj, r.pred, r.obj): r.confidence
        for r in predict_edges(tdf, rules, min_conf=0.5).collect()
    }
    # dave's missing country edge is predicted by the 0.75 rule
    assert pred[("dave", "lives_in_country", "germany")] == 0.75
    # no prediction may duplicate an asserted triple
    asserted = {(s, p, o) for s, p, o in TRIPLES}
    assert not (set(pred) & asserted)
    # best-rule scoring: every confidence comes from a rule >= 0.5
    assert all(c >= 0.5 for c in pred.values())


def test_predict_best_rule_wins(spark):
    # two rules predict the same edge with different confidence ->
    # max() keeps the stronger one
    rows = [
        ("a", "p", "m1"),
        ("m1", "q", "b"),
        ("a", "r", "m2"),
        ("m2", "s", "b"),
        # grounding making p/q high-conf and r/s lower-conf elsewhere
        ("c", "p", "m3"),
        ("m3", "q", "d"),
        ("c", "h", "d"),
        ("e", "r", "m4"),
        ("m4", "s", "f"),
        ("e", "h", "f"),
        ("g", "r", "m5"),
        ("m5", "s", "h"),
    ]
    tdf = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    rules = mine_path_rules(tdf, min_support=1, min_conf=0.0)
    rmap = _rules_map(rules)
    assert rmap[("p", "q", "h")][3] == 0.5  # 1 of 2 body pairs asserted
    assert rmap[("r", "s", "h")][3] == round(1 / 3, 6)
    pred = {
        (r.subj, r.pred, r.obj): r.confidence
        for r in predict_edges(tdf, rules, min_conf=0.0).collect()
    }
    assert pred[("a", "h", "b")] == 0.5  # max(0.5, 0.333333)


def test_custom_columns(spark):
    tdf = spark.createDataFrame(
        [("x", "p", "y"), ("y", "q", "z"), ("x", "h", "z")],
        ["s", "rel", "t"],
    )
    got = mine_path_rules(
        tdf, min_support=1, min_conf=0.0, s_col="s", p_col="rel", o_col="t"
    )
    assert ("p", "q", "h") in {(r.p1, r.p2, r.head) for r in got.collect()}
    pred = predict_edges(
        tdf.where(F.col("rel") != "h"),
        got,
        min_conf=0.0,
        s_col="s",
        p_col="rel",
        o_col="t",
    )
    assert pred.columns == ["s", "rel", "t", "confidence"]


def test_schema_induction(spark):
    from pg_iui_ner_api_spark.operators.rules import schema_induction

    t = spark.createDataFrame(
        [
            ("PER:a", "works_for", "ORG:x"),
            ("PER:a", "works_for", "ORG:x"),  # dup collapses
            ("PER:b", "works_for", "ORG:x"),
            ("PER:b", "works_for", "LOC:q"),  # polymorphic range
            ("ORG:x", "located_in", "LOC:q"),
        ],
        ["subj", "pred", "obj"],
    )
    got = {
        (r.subj_type, r.pred, r.obj_type): (
            r.n_triples, r.n_subjects, r.n_objects
        )
        for r in schema_induction(t).collect()
    }
    assert got == {
        ("PER", "works_for", "ORG"): (2, 2, 1),
        ("PER", "works_for", "LOC"): (1, 1, 1),
        ("ORG", "located_in", "LOC"): (1, 1, 1),
    }


def test_pair_sampling_matches_filtered_bruteforce(spark):
    """pair_sample_mod must equal brute force restricted to the same
    md5-bucket pair universe — the determinism that makes the sampled
    confidence oracle-exact."""
    import hashlib

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = [
        (f"e{i}", "p", f"m{i % 5}") for i in range(20)
    ] + [
        (f"m{j}", "q", f"t{j % 3}") for j in range(5)
    ] + [
        (f"e{i}", "h", f"t{(i % 5) % 3}") for i in range(0, 20, 2)
    ]
    tdf = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    mod = 3
    got = _rules_map(
        mine_path_rules(tdf, min_support=1, min_conf=0.0,
                        pair_sample_mod=mod)
    )
    # brute force over the sampled pair universe
    t = sorted(set(rows))
    by_s = {}
    for s, p, o in t:
        by_s.setdefault(s, []).append((p, o))
    from collections import defaultdict
    body = defaultdict(set)
    for x, p1, z in t:
        for p2, y in by_s.get(z, ()):
            if ((h64(x) % mod) + (h64(y) % mod)) % mod == 0:
                body[(p1, p2)].add((x, y))
    heads = defaultdict(set)
    for s, p, o in t:
        heads[p].add((s, o))
    want = {}
    for (p1, p2), pairs in body.items():
        for head, hp in heads.items():
            sup = len(pairs & hp)
            if sup >= 1:
                want[(p1, p2, head)] = (
                    sup, len(pairs), len(hp),
                    round(sup / len(pairs), 6), round(sup / len(hp), 6),
                )
    assert got == want
    with pytest.raises(ValueError):
        mine_path_rules(tdf, pair_sample_mod=0)
