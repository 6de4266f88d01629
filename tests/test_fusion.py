"""Knowledge fusion: multi-source triple confidence aggregation.

Oracle: brute-force python noisy-or over hand-built extraction rows,
including the score==1.0 clamp and per-doc distinct counting.
"""

import math

import pytest

from pg_iui_ner_api_spark.operators.fusion import fuse_triples

ROWS = [
    # (subj, pred, obj, score, doc_id)
    ("e1", "rel", "e2", 0.5, "d1"),
    ("e1", "rel", "e2", 0.5, "d1"),   # same doc twice -> n_docs stays 1
    ("e1", "rel", "e2", 0.2, "d2"),
    ("e3", "rel", "e4", 1.0, "d1"),   # clamped: ln(1-s) must not be -inf
    ("e3", "rel", "e4", 0.0, "d3"),   # zero evidence contributes nothing
    ("e5", "is_a", "e6", 0.9, "d4"),
]


def _py_fuse(rows):
    by_key = {}
    for s, p, o, sc, d in rows:
        by_key.setdefault((s, p, o), []).append((sc, d))
    out = {}
    for k, vs in by_key.items():
        scores = [sc for sc, _ in vs]
        log_sum = sum(math.log(1.0 - min(sc, 1.0 - 1e-9)) for sc in scores)
        out[k] = (
            len(vs),
            len({d for _, d in vs}),
            max(scores),
            min(scores),
            1.0 - math.exp(log_sum),
        )
    return out


def test_fuse_triples_matches_bruteforce(spark):
    df = spark.createDataFrame(
        ROWS, schema=["subj", "pred", "obj", "score", "doc_id"]
    )
    got = {
        (r["subj"], r["pred"], r["obj"]): (
            r["n_mentions"], r["n_docs"], r["max_score"], r["min_score"], r["noisy_or"]
        )
        for r in fuse_triples(df).collect()
    }
    want = _py_fuse(ROWS)
    assert set(got) == set(want)
    for k, (n, nd, mx, mn, no) in want.items():
        assert got[k][:4] == (n, nd, mx, mn)
        assert got[k][4] == pytest.approx(no, abs=1e-12)
    # noisy-or dominates max when evidence accumulates
    assert got[("e1", "rel", "e2")][4] > 0.5
    # certain + zero evidence -> essentially 1.0, never > 1
    assert got[("e3", "rel", "e4")][4] == pytest.approx(1.0, abs=1e-8)
    assert all(v[4] < 1.0 + 1e-15 for v in got.values())


def test_fuse_triples_single_shuffle_jvm_only(spark):
    df = spark.createDataFrame(
        ROWS, schema=["subj", "pred", "obj", "score", "doc_id"]
    )
    plan = fuse_triples(df)._jdf.queryExecution().executedPlan().toString()
    # distinct-count rewrites to expand + two-phase agg, but stays a
    # single key-hash Exchange chain with map-side partials, zero Python
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan


def test_functional_violations(spark):
    rows = [
        ("e1", "born_in", "1950", "d1"),
        ("e1", "born_in", "1950", "d2"),   # same object twice: no violation
        ("e2", "born_in", "1950", "d1"),
        ("e2", "born_in", "1951", "d2"),   # two distinct objects: violation
        ("e2", "likes", "x", "d1"),
        ("e2", "likes", "y", "d2"),        # non-functional pred: ignored
    ]
    df = spark.createDataFrame(rows, schema=["subj", "pred", "obj", "doc_id"])
    from pg_iui_ner_api_spark.operators.fusion import functional_violations

    got = [
        (r["subj"], r["pred"], r["n_objs"])
        for r in functional_violations(df, ["born_in"]).collect()
    ]
    assert got == [("e2", "born_in", 2)]


def test_entity_report_hand_graph(spark):
    from pg_iui_ner_api_spark.operators.fusion import entity_report

    t = spark.createDataFrame(
        [
            ("a", "p", "x"),
            ("a", "p", "y"),
            ("a", "q", "x"),
            ("a", "p", "x"),   # dup collapses
            ("x", "r", "y"),
        ],
        ["subj", "pred", "obj"],
    )
    got = {r.entity: (r.n_out, r.n_in, r.n_total, r.n_out_preds,
                      r.top_out_pred, r.top_in_pred)
           for r in entity_report(t).collect()}
    assert got["a"] == (3, 0, 3, 2, "p", None)          # p beats q 2-1
    assert got["x"] == (1, 2, 3, 1, "r", "p")           # p beats q 1-1? no:
    # x's in-preds: p (from a,p,x) x1 distinct + q x1 -> tie -> min = p
    assert got["y"] == (0, 2, 2, 0, None, "p")          # p x1, r x1 tie -> p
    assert set(got) == {"a", "x", "y"}
