"""DSIR importance resampling (operators/dsir.py) vs an independent
pure-Python oracle of the same hashed-bigram model + Gumbel-top-k."""

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.operators.dsir import dsir_select, dsir_weights

B = 64  # small bucket count so collisions actually occur in the test

TARGET = [
    ("t1", "the cat sat on the mat"),
    ("t2", "the dog sat on the rug"),
    ("t3", "a cat and a dog sat"),
]
RAW = [
    ("r1", "the cat sat on the mat again"),       # target-like
    ("r2", "the dog sat on the mat"),             # target-like
    ("r3", "stochastic gradient descent converges slowly"),  # off-dist
    ("r4", "quarterly revenue guidance exceeded expectations"),  # off-dist
    ("r5", "a cat sat"),                          # short but target-like
    ("r6", "x"),                                  # 1 token -> no features
]


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(t):
    return [w for w in " ".join(t.lower().split()).split(" ") if w]


def _feats(texts):
    out = {}
    for d, t in texts:
        w = _toks(t)
        if len(w) >= 2:
            out[d] = [_h(f"{w[i]} {w[i+1]}") % B for i in range(len(w) - 1)]
    return out


def _py_weights():
    rf, tf = _feats(RAW), _feats(TARGET)
    rc = Counter(b for fs in rf.values() for b in fs)
    tc = Counter(b for fs in tf.values() for b in fs)
    nr, nt = sum(rc.values()), sum(tc.values())
    out = {}
    for d, fs in rf.items():
        s = sum(
            math.log((tc[b] + 1.0) / (nt + B)) - math.log((rc[b] + 1.0) / (nr + B))
            for b in fs
        )
        out[d] = (len(fs), s)
    return out


def _py_gumbel(doc_id, seed="s0"):
    k = int(hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:15], 16)
    u = (k + 1.0) / (2.0**60 + 1.0)
    return -math.log(-math.log(u))


@pytest.fixture(scope="module")
def frames(spark):
    sch = "doc_id string, text string"
    return (
        spark.createDataFrame(RAW, sch),
        spark.createDataFrame(TARGET, sch),
    )


def test_weights_match_python_oracle(spark, frames):
    raw, target = frames
    got = {
        r["doc_id"]: (r["n_feats"], r["logratio"])
        for r in dsir_weights(raw, target, buckets=B).collect()
    }
    want = _py_weights()
    assert set(got) == set(want)  # r6 (1 token) absent from both
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == pytest.approx(want[d][1], rel=1e-9)


def test_target_like_docs_outweigh_off_distribution(spark, frames):
    raw, target = frames
    got = {r["doc_id"]: r["logratio"]
           for r in dsir_weights(raw, target, buckets=B).collect()}
    assert min(got["r1"], got["r2"], got["r5"]) > max(got["r3"], got["r4"])


def test_select_matches_python_gumbel_topk(spark, frames):
    raw, target = frames
    want_scores = {
        d: (nf, s, s + _py_gumbel(d)) for d, (nf, s) in _py_weights().items()
    }
    want_order = sorted(want_scores, key=lambda d: (-want_scores[d][2], d))[:3]
    got = dsir_select(raw, target, k=3, buckets=B).collect()
    assert [r["doc_id"] for r in got] == want_order
    for r in got:
        nf, s, sc = want_scores[r["doc_id"]]
        assert r["n_feats"] == nf
        assert r["logratio"] == pytest.approx(round(s, 4), abs=1e-4)
        assert r["sel_score"] == pytest.approx(round(sc, 4), abs=1e-4)


def test_select_is_rerun_deterministic_and_seed_sensitive(spark, frames):
    raw, target = frames
    a = [tuple(r) for r in dsir_select(raw, target, k=3, buckets=B).collect()]
    b = [tuple(r) for r in dsir_select(raw, target, k=3, buckets=B).collect()]
    assert a == b
    # some seed among a few candidates must change the selection order
    orders = {
        tuple(
            r["doc_id"]
            for r in dsir_select(raw, target, k=3, seed=s, buckets=B).collect()
        )
        for s in ("s0", "s1", "s2", "s3")
    }
    assert len(orders) > 1


def test_plan_broadcasts_ratio_table_and_stays_jvm(spark, frames):
    raw, target = frames
    plan = (
        dsir_weights(raw, target, buckets=B)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
