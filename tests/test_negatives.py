"""KG negative sampling (operators/negatives.py) vs an independent
pure-Python replay of the same md5 chains."""

import hashlib

import pytest

from pg_iui_ner_api_spark.operators import negatives as N

EDGES = [
    ("a", "knows", "b"),
    ("a", "knows", "c"),
    ("b", "likes", "c"),
    ("c", "knows", "d"),
    ("d", "likes", "a"),
]
B = 4
SEED = "t0"


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_negatives(edges, n_neg, seed, buckets):
    nodes = sorted({e[0] for e in edges} | {e[2] for e in edges})
    dim = {}
    per_bucket = {}
    for n in nodes:  # sorted order == window orderBy(node)
        b = _h(n) % buckets
        dim[(b, len(per_bucket.setdefault(b, [])))] = n
        per_bucket[b].append(n)
    truth = set(edges)
    nonempty = sorted(per_bucket)  # dense rank over non-empty buckets
    out = set()
    for s, p, o in edges:
        for i in range(n_neg):
            key = f"{seed}|{s}|{p}|{o}|{i}"
            side = _h(f"{key}|s") % 2
            b = nonempty[_h(f"{key}|b") % len(nonempty)]
            idx = _h(f"{key}|j") % len(per_bucket[b])
            repl = dim[(b, idx)]
            ns, no = (repl, o) if side == 0 else (s, repl)
            cs = "subj" if side == 0 else "obj"
            if side == 0 and ns == s:
                continue
            if side == 1 and no == o:
                continue
            if (ns, p, no) in truth:
                continue
            out.add((s, p, o, i, cs, ns, no))
    return out


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "subj string, pred string, obj string")


def test_negatives_match_python_replay(spark, edges_df):
    got = {
        (r["subj"], r["pred"], r["obj"], r["neg_idx"], r["corrupt_side"],
         r["neg_subj"], r["neg_obj"])
        for r in N.negative_triples(edges_df, n_neg=3, seed=SEED, buckets=B).collect()
    }
    assert got == _py_negatives(EDGES, 3, SEED, B)
    assert got  # the guard filters must not empty the sample here


def test_negatives_never_emit_true_or_self_triples(spark, edges_df):
    rows = N.negative_triples(edges_df, n_neg=4, seed="x", buckets=B).collect()
    truth = set(EDGES)
    for r in rows:
        assert (r["neg_subj"], r["pred"], r["neg_obj"]) not in truth
        if r["corrupt_side"] == "subj":
            assert r["neg_subj"] != r["subj"] and r["neg_obj"] == r["obj"]
        else:
            assert r["neg_obj"] != r["obj"] and r["neg_subj"] == r["subj"]
        # replacements come from the edge list's own entity universe
        universe = {e[0] for e in EDGES} | {e[2] for e in EDGES}
        assert r["neg_subj"] in universe and r["neg_obj"] in universe


def test_negatives_deterministic_and_seed_sensitive(spark, edges_df):
    a = set(map(tuple, N.negative_triples(edges_df, 2, "s1", B).collect()))
    b = set(map(tuple, N.negative_triples(edges_df, 2, "s1", B).collect()))
    assert a == b
    variants = {
        frozenset(map(tuple, N.negative_triples(edges_df, 2, s, B).collect()))
        for s in ("s1", "s2", "s3")
    }
    assert len(variants) > 1


def test_negatives_small_universe_large_buckets_no_silent_drop(spark, edges_df):
    # regression: with buckets >> |nodes| most raw bucket ids are empty;
    # the dense-rank selection must still resolve every replica (losses
    # only from the self/closed-world guards). 5 edges x 4 replicas = 20
    # requested over a 4-node universe.
    rows = N.negative_triples(edges_df, n_neg=4, seed=SEED, buckets=64).collect()
    assert len(rows) == len(_py_negatives(EDGES, 4, SEED, 64))
    assert len(rows) >= 10


def test_node_index_is_dense_per_bucket(spark, edges_df):
    nodes = edges_df.selectExpr("subj AS node").union(
        edges_df.selectExpr("obj AS node")
    ).distinct()
    rows = N.node_index(nodes, buckets=B).collect()
    assert len(rows) == len({r["node"] for r in rows})
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["idx"])
    for idxs in by_bucket.values():
        assert sorted(idxs) == list(range(len(idxs)))


def test_negatives_plan_broadcasts_sizes_and_stays_jvm(spark, edges_df):
    plan = (
        N.negative_triples(edges_df, 2, SEED, B)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
