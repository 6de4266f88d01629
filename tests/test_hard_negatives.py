"""Hard-negative mining: parity with a numpy reference, label/self
guarantees, IVF recall floor, and plan shape (IVF = equi-join, never a
cartesian)."""

import math

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.operators.ann import hard_negatives

DIM = 8
N = 80
K = 3


def _vec(i):
    # deterministic distinct unit-ish vectors on a few clusters
    base = [(i % 4) * 1.0 + 0.1 * ((i * 7 + j * 13) % 11) for j in range(DIM)]
    n = math.sqrt(sum(x * x for x in base)) or 1.0
    return [x / n for x in base]


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [(i, _vec(i), i % 3) for i in range(N)]
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def _ref_topk(rows, k):
    out = {}
    for i, vi, li in rows:
        # float32 storage first (matches array<float> round-trip)
        import numpy as np

        a = np.array(vi, dtype=np.float32).astype(float)
        cand = []
        for j, vj, lj in rows:
            if j == i or lj == li:
                continue
            b = np.array(vj, dtype=np.float32).astype(float)
            cos = float(a @ b) / max(
                math.sqrt(float(a @ a)) * math.sqrt(float(b @ b)), 1e-12
            )
            cand.append((round(cos, 6), j, lj))
        cand.sort(key=lambda t: (-t[0], t[1]))
        out[i] = cand[:k]
    return out


def test_exact_matches_numpy_reference(spark, vecs):
    rows, df = vecs
    got = hard_negatives(df, k=K).collect()
    ref = _ref_topk(rows, K)
    by_anchor = {}
    for r in got:
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    assert set(by_anchor) == set(ref)
    for a, lst in by_anchor.items():
        lst.sort(key=lambda r: r["rank"])
        assert [(r["cos"], r["neg_id"], r["neg_label"]) for r in lst] == pytest.approx(
            [(c, j, lj) for c, j, lj in ref[a]]
        )


def test_never_same_label_or_self(spark, vecs):
    _, df = vecs
    got = hard_negatives(df, k=K).collect()
    assert all(r["anchor_label"] != r["neg_label"] for r in got)
    assert all(r["anchor_id"] != r["neg_id"] for r in got)
    assert all(1 <= r["rank"] <= K for r in got)


def test_ivf_recall_floor_and_subset(spark, vecs):
    rows, df = vecs
    exact = {
        (r["anchor_id"], r["neg_id"])
        for r in hard_negatives(df, k=K).collect()
    }
    approx_rows = hard_negatives(df, k=K, ncells=4, dim=DIM).collect()
    approx = {(r["anchor_id"], r["neg_id"]) for r in approx_rows}
    # every approx pair is a REAL different-label pair…
    lbl = {i: l for i, _, l in rows}
    assert all(lbl[a] != lbl[b] for a, b in approx)
    # …and bucketing keeps a sane share of the true hardest negatives
    assert len(approx & exact) / len(exact) >= 0.5


def test_empty_and_single_label(spark):
    df = spark.createDataFrame(
        [(i, _vec(i), 1) for i in range(10)],
        "vec_id long, embedding array<float>, label int",
    )
    assert hard_negatives(df, k=K).count() == 0  # no cross-label pair exists
    with pytest.raises(ValueError):
        hard_negatives(df, k=0)
    with pytest.raises(ValueError):
        hard_negatives(df, k=K, ncells=4)  # dim required


def test_ivf_plan_is_equi_join(spark, vecs):
    _, df = vecs
    out = hard_negatives(df, k=K, ncells=4, dim=DIM)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
