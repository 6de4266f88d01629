"""Fellegi-Sunter EM: parity with an independent pure-Python EM
reference, separation behavior on planted matches, degenerate inputs,
and the plan property that E-step/scoring are JVM-only Column algebra."""

import math

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.operators.record_linkage import (
    EPS,
    fellegi_sunter_em,
)

FIELDS = ["a_name", "a_year", "a_city"]


def _py_em(rows, iters=3, init_m=0.9, init_u=0.1, init_lam=0.5):
    """Independent reference: same model, written against plain lists."""
    clamp = lambda x: min(max(x, EPS), 1.0 - EPS)  # noqa: E731
    K = len(rows[0]) if rows else 3
    m = [clamp(init_m)] * K
    u = [clamp(init_u)] * K
    lam = clamp(init_lam)
    for _ in range(iters):
        if not rows:
            break
        posts = []
        for g in rows:
            pm, pu = lam, 1.0 - lam
            for k in range(K):
                pm *= m[k] if g[k] else 1.0 - m[k]
                pu *= u[k] if g[k] else 1.0 - u[k]
            posts.append(pm / (pm + pu))
        n = len(rows)
        sp = sum(posts)
        sn = n - sp
        lam = clamp(sp / n)
        m = [
            clamp(sum(p * g[k] for p, g in zip(posts, rows)) / sp)
            if sp > 0
            else m[k]
            for k in range(K)
        ]
        u = [
            clamp(sum((1 - p) * g[k] for p, g in zip(posts, rows)) / sn)
            if sn > 0
            else u[k]
            for k in range(K)
        ]
    return m, u, lam


@pytest.fixture(scope="module")
def planted(spark):
    """600 pairs: 100 planted matches (mostly-agreeing fields) + 500
    non-matches (mostly disagreeing), fully deterministic."""
    rows = []
    for i in range(100):  # matches: fields agree unless i hits a modulus
        rows.append((i, (i % 10 != 0) * 1, (i % 7 != 0) * 1, (i % 5 != 0) * 1))
    for i in range(100, 600):  # non-matches: rare accidental agreement
        rows.append((i, (i % 17 == 0) * 1, (i % 13 == 0) * 1, (i % 11 == 0) * 1))
    df = spark.createDataFrame(
        rows, ["pair_id", "a_name", "a_year", "a_city"]
    )
    return rows, df


def test_params_match_python_reference(spark, planted):
    rows, df = planted
    _, params = fellegi_sunter_em(df, FIELDS, iters=3)
    m_ref, u_ref, lam_ref = _py_em([r[1:] for r in rows], iters=3)
    assert params["n_pairs"] == 600
    assert params["lam"] == pytest.approx(lam_ref, rel=1e-9)
    for k in range(3):
        assert params["m"][k] == pytest.approx(m_ref[k], rel=1e-9)
        assert params["u"][k] == pytest.approx(u_ref[k], rel=1e-9)


def test_scores_match_python_reference(spark, planted):
    rows, df = planted
    scored, params = fellegi_sunter_em(df, FIELDS, iters=3)
    m, u, lam = params["m"], params["u"], params["lam"]
    got = {r["pair_id"]: (r["match_weight"], r["posterior"]) for r in scored.collect()}
    for r in rows:
        g = r[1:]
        w = sum(
            math.log2(m[k] / u[k]) if g[k] else math.log2((1 - m[k]) / (1 - u[k]))
            for k in range(3)
        )
        pm, pu = lam, 1.0 - lam
        for k in range(3):
            pm *= m[k] if g[k] else 1.0 - m[k]
            pu *= u[k] if g[k] else 1.0 - u[k]
        assert got[r[0]][0] == pytest.approx(round(w, 6), abs=2e-6)
        assert got[r[0]][1] == pytest.approx(round(pm / (pm + pu), 6), abs=2e-6)


def test_em_separates_planted_clusters(spark, planted):
    """EM must discover the planted structure unsupervised: every
    all-agree pair scores above every all-disagree pair, and the fitted
    m_k exceed u_k on every field."""
    rows, df = planted
    scored, params = fellegi_sunter_em(df, FIELDS, iters=3)
    assert all(mk > uk for mk, uk in zip(params["m"], params["u"]))
    by_id = {r["pair_id"]: r for r in scored.collect()}
    hi = [by_id[r[0]]["posterior"] for r in rows if sum(r[1:]) == 3]
    lo = [by_id[r[0]]["posterior"] for r in rows if sum(r[1:]) == 0]
    assert hi and lo and min(hi) > max(lo)


def test_posterior_monotone_in_agreement_count(spark, planted):
    _, df = planted
    scored, _ = fellegi_sunter_em(df, FIELDS, iters=3)
    rows = scored.withColumn(
        "n_agree", F.col("a_name") + F.col("a_year") + F.col("a_city")
    ).collect()
    best_by_count = {}
    for r in rows:
        c = r["n_agree"]
        best_by_count.setdefault(c, set()).add(r["posterior"])
    counts = sorted(best_by_count)
    # all-fields-same-init symmetry is broken by EM, but posterior must
    # still rise with the number of agreeing fields on average
    means = [sum(best_by_count[c]) / len(best_by_count[c]) for c in counts]
    assert means == sorted(means)


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "pair_id long, a_name int, a_year int, a_city int")
    scored, params = fellegi_sunter_em(df, FIELDS, iters=3)
    assert scored.count() == 0
    assert "match_weight" in scored.columns and "posterior" in scored.columns
    assert params["n_pairs"] == 0
    assert params["m"] == [0.9] * 3  # inits retained untouched


def test_degenerate_all_agree_field_stays_clamped(spark):
    rows = [(i, 1, i % 2, (i + 1) % 2) for i in range(50)]
    df = spark.createDataFrame(rows, ["pair_id", "a1", "a2", "a3"])
    _, params = fellegi_sunter_em(df, ["a1", "a2", "a3"], iters=5)
    for v in params["m"] + params["u"] + [params["lam"]]:
        assert EPS <= v <= 1.0 - EPS


def test_invalid_args_rejected(spark, planted):
    _, df = planted
    with pytest.raises(ValueError):
        fellegi_sunter_em(df, [], iters=3)
    with pytest.raises(ValueError):
        fellegi_sunter_em(df, FIELDS, iters=0)


def test_scoring_plan_is_jvm_only(spark, planted):
    """E-step/scoring plan pin: a single map-side Project over the pair
    scan — no Python workers, no Exchange, params folded as literals."""
    _, df = planted
    scored, _ = fellegi_sunter_em(df, FIELDS, iters=1)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "Exchange" not in plan


def test_resolve_clusters_transitive(spark):
    """A≈B and B≈C at high posterior must land in ONE cluster even
    though (A,C) was never a candidate pair; low-posterior pairs must
    not merge; unmatched records keep themselves."""
    from pg_iui_ner_api_spark.operators.record_linkage import resolve_clusters

    records = spark.createDataFrame(
        [(i,) for i in range(7)], "rid long"
    )
    scored = spark.createDataFrame(
        [
            (0, 1, 0.95),
            (1, 2, 0.90),   # chain 0-1-2
            (3, 4, 0.10),   # below threshold: no merge
            (5, 6, 0.75),
        ],
        "ida long, idb long, posterior double",
    )
    got = {
        r["rid"]: (r["cluster_id"], r["keep"])
        for r in resolve_clusters(
            records, scored, "ida", "idb", "rid", min_posterior=0.5
        ).collect()
    }
    assert got[0] == (0, True) and got[1] == (0, False) and got[2] == (0, False)
    assert got[3] == (3, True) and got[4] == (4, True)
    assert got[5] == (5, True) and got[6] == (5, False)
