"""KG embeddings (TransE): hash-replay scoring parity, numpy epoch
parity, convergence."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from pg_iui_ner_api_spark.operators.kge import (
    init_embeddings,
    transe_epoch,
    transe_int_scores,
    transe_loss,
)

TRIPLES = [
    ("c:1", "in_nation", "n:1"),
    ("c:2", "in_nation", "n:1"),
    ("c:3", "in_nation", "n:2"),
    ("s:1", "in_nation", "n:2"),
    ("o:1", "placed_by", "c:1"),
    ("o:2", "placed_by", "c:2"),
    ("o:3", "placed_by", "c:1"),
]


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _comp(kind: str, ident: str, j: int, seed: str = "kge") -> int:
    return _h64(f"{seed}|{kind}|{ident}|{j}") % 2001 - 1000


def test_int_scores_match_hash_replay(spark):
    df = spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])
    got = {(r.subj, r.pred, r.obj): r.d2
           for r in transe_int_scores(df, dim=8).collect()}
    for s, p, o in TRIPLES:
        want = sum(
            (_comp("e", s, j) + _comp("r", p, j) - _comp("e", o, j)) ** 2
            for j in range(8)
        )
        assert got[(s, p, o)] == want


def test_init_embeddings_deterministic_and_scaled(spark):
    ids = spark.createDataFrame([("a",), ("b",), ("a",)], ["id"])
    out = {r.id: r.emb for r in
           init_embeddings(ids, "e", dim=4, scale=0.1).collect()}
    assert set(out) == {"a", "b"}
    for ident, emb in out.items():
        assert len(emb) == 4
        for j, v in enumerate(emb):
            assert v == pytest.approx(_comp("e", ident, j) / 1000.0 * 0.1)
            assert abs(v) <= 0.1


def _numpy_epoch(edges, negs, ent, rel, lr, margin):
    ent = {k: v.copy() for k, v in ent.items()}
    rel = {k: v.copy() for k, v in rel.items()}
    ge = {k: np.zeros_like(v) for k, v in ent.items()}
    gr = {k: np.zeros_like(v) for k, v in rel.items()}
    for s, p, o, nh, nt in negs:
        pos = ent[s] + rel[p] - ent[o]
        ngd = ent[nh] + rel[p] - ent[nt]
        if margin + pos @ pos - ngd @ ngd > 0:
            ge[s] += 2 * pos
            ge[o] -= 2 * pos
            ge[nh] -= 2 * ngd
            ge[nt] += 2 * ngd
            gr[p] += 2 * pos - 2 * ngd
    for k in ent:
        ent[k] = ent[k] - lr * ge[k]
    for k in rel:
        rel[k] = rel[k] - lr * gr[k]
    return ent, rel


def test_epoch_matches_numpy_replay(spark):
    edges = spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])
    ents = spark.createDataFrame(
        [(e,) for e in sorted({x for s, _, o in TRIPLES for x in (s, o)})],
        ["id"],
    )
    rels = spark.createDataFrame(
        [(p,) for p in sorted({p for _, p, _ in TRIPLES})], ["id"]
    )
    ent0 = init_embeddings(ents, "e", dim=6)
    rel0 = init_embeddings(rels, "r", dim=6)
    from pg_iui_ner_api_spark.operators.negatives import negative_triples

    negs = negative_triples(edges, n_neg=1, seed="ep0").localCheckpoint()
    e1, r1 = transe_epoch(
        edges, ent0, rel0, lr=0.01, margin=1.0, negatives=negs
    )
    ent_np = {r.id: np.array(r.emb) for r in ent0.collect()}
    rel_np = {r.id: np.array(r.emb) for r in rel0.collect()}
    neg_rows = [
        (r.subj, r.pred, r.obj,
         r.neg_subj if r.neg_subj is not None else r.subj,
         r.neg_obj if r.neg_obj is not None else r.obj)
        for r in negs.collect()
    ]
    want_e, want_r = _numpy_epoch(TRIPLES, neg_rows, ent_np, rel_np,
                                  0.01, 1.0)
    got_e = {r.id: np.array(r.emb) for r in e1.collect()}
    got_r = {r.id: np.array(r.emb) for r in r1.collect()}
    assert set(got_e) == set(want_e) and set(got_r) == set(want_r)
    for k in want_e:
        np.testing.assert_allclose(got_e[k], want_e[k], rtol=1e-9)
    for k in want_r:
        np.testing.assert_allclose(got_r[k], want_r[k], rtol=1e-9)


def test_epochs_reduce_hinge_loss(spark):
    edges = spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])
    ents = spark.createDataFrame(
        [(e,) for e in sorted({x for s, _, o in TRIPLES for x in (s, o)})],
        ["id"],
    )
    rels = spark.createDataFrame(
        [(p,) for p in sorted({p for _, p, _ in TRIPLES})], ["id"]
    )
    from pg_iui_ner_api_spark.operators.negatives import negative_triples

    negs = negative_triples(edges, n_neg=1, seed="ep0").localCheckpoint()
    ent, rel = init_embeddings(ents, "e", dim=6), init_embeddings(rels, "r", dim=6)
    [l0] = transe_loss(edges, ent, rel, negatives=negs).collect()
    for _ in range(3):
        ent, rel = transe_epoch(edges, ent, rel, lr=0.005, negatives=negs)
        ent = ent.localCheckpoint()
        rel = rel.localCheckpoint()
    [l1] = transe_loss(edges, ent, rel, negatives=negs).collect()
    assert l1.n_pairs == l0.n_pairs > 0
    assert l1.mean_hinge < l0.mean_hinge


def test_validation(spark):
    df = spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])
    with pytest.raises(ValueError):
        transe_int_scores(df, dim=0)
    with pytest.raises(ValueError):
        init_embeddings(df.select(F_col("subj").alias("id")), "e", dim=0)


def F_col(name):
    from pyspark.sql import functions as F

    return F.col(name)
