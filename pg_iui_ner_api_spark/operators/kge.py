"""KG embeddings: deterministic init, exact-integer TransE scoring,
and a full-batch TransE training epoch in pure DataFrame algebra.

TransE (Bordes et al., NeurIPS 2013) models a triple (h, r, t) as
h + r ~ t and scores it by the distance d(h + r, t); training pushes
positive triples below corrupted ones by a margin. This module gives
the engine the graph-native training loop the KG pipeline feeds —
link-prediction scoring over the materialized node/edge tables — in
three pieces, each scale-shaped:

* :func:`transe_int_scores` — MAP-ONLY exact-integer scoring. Every
  embedding component is derived in-row from the md5 chain
  ``portable_hash64(seed|kind|id|j) % 2001 - 1000`` (an integer in
  [-1000, 1000]), and the squared L2 distance is an exact BIGINT fold,
  so the whole operator is one whole-stage-codegen projection with
  ZERO joins and ZERO shuffles at any corpus size — and the DuckDB
  twin replays it bit-for-bit (sums of integers are order-free).
* :func:`init_embeddings` — the same chain materialized as a
  dimension-sized (id, emb: array<double>) table for training.
* :func:`transe_epoch` — one full-batch subgradient epoch: per-triple
  gradients computed IN-ROW (zip_with algebra over the joined
  embedding arrays, hinge-active rows only), then ONE partial-
  aggregable (id, dim) sum and a dimension-sized update join — the
  same data-parallel GD shape as quality_model's logistic training.
  Negatives come from :func:`negatives.negative_triples` (the engine's
  deterministic corrupted-triple generator), so the epoch is a pure
  function of (edges, seed).

Reference seam: the reference service has no training loop over its
emitted entities (models arrive pre-trained — /root/reference/src/
model/training.py trains the NER tagger, not the KG); this is part of
the beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import portable_hash64


def _int_comp(kind: str, idc, j, seed: str):
    """Deterministic embedding component in [-1000, 1000] (exact int)."""
    return (
        F.pmod(
            portable_hash64(
                F.concat_ws(
                    "|", F.lit(seed), F.lit(kind),
                    idc.cast("string"), j.cast("string"),
                )
            ),
            F.lit(2001),
        )
        - 1000
    )


def transe_int_scores(
    triples: DataFrame, dim: int = 16, seed: str = "kge"
) -> DataFrame:
    """(subj, pred, obj) -> (subj, pred, obj, d2) with
    ``d2 = sum_j (h_j + r_j - t_j)^2`` over the deterministic integer
    embeddings — exact BIGINT, map-only, join-free (see module doc)."""
    if dim < 1:
        raise ValueError("dim must be >= 1")
    s, p, o = F.col("subj"), F.col("pred"), F.col("obj")
    d2 = F.aggregate(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + (
            lambda diff: diff * diff
        )(
            (
                _int_comp("e", s, j, seed)
                + _int_comp("r", p, j, seed)
                - _int_comp("e", o, j, seed)
            ).cast("long")
        ),
    )
    return triples.select("subj", "pred", "obj", d2.alias("d2"))


def init_embeddings(
    ids: DataFrame, kind: str, dim: int = 16, seed: str = "kge",
    scale: float = 0.1, id_col: str = "id",
) -> DataFrame:
    """Dimension-sized (id, emb: array<double>) table from the same md5
    chain as :func:`transe_int_scores`: component j =
    ``(hash % 2001 - 1000) / 1000 * scale``."""
    if dim < 1:
        raise ValueError("dim must be >= 1")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: _int_comp(kind, F.col(id_col), j, seed).cast("double")
        / 1000.0
        * F.lit(float(scale)),
    )
    return ids.select(F.col(id_col).alias("id")).distinct().select(
        "id", emb.alias("emb")
    )


def _sq_dist(a, b):
    """Exact in-row squared L2 of (a - b): left-associated fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x - y),
        F.lit(0.0),
        lambda acc, d: acc + d * d,
    )


def transe_epoch(
    edges: DataFrame,
    ent_emb: DataFrame,
    rel_emb: DataFrame,
    lr: float = 0.01,
    margin: float = 1.0,
    seed: str = "ep0",
    buckets: int = 64,
    negatives: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """One full-batch TransE subgradient epoch over ``edges``
    (subj, pred, obj) against (id, emb) entity / relation tables.
    Returns (new_ent_emb, new_rel_emb).

    Loss per (positive, corrupted) pair: ``max(0, margin + |h+r-t|^2 -
    |h'+r-t'|^2)``; hinge-active pairs contribute the exact subgradient
    (2x the difference vectors, signs per corrupted side). No
    normalization step — updates are the plain subgradient so the
    pytest numpy replay matches to float tolerance.

    Scale shape: 5 hash joins of the triple list against the
    dimension-sized embedding tables (ids + dim-length arrays on the
    wire), per-pair gradients built IN-ROW, one explode to (id, dim_j,
    g) rows -> ONE partial-aggregable groupBy sum -> dimension-sized
    update join. Nothing corpus-sized survives past the gradient
    aggregation. ``negatives`` defaults to the engine's deterministic
    :func:`negatives.negative_triples` (n_neg=1) so the epoch is a
    pure function of (edges, seed); pass an explicit frame to replay.
    """
    from .negatives import negative_triples

    if negatives is None:
        negatives = negative_triples(edges, n_neg=1, seed=seed,
                                     buckets=buckets)
    neg = negatives.select(
        "subj", "pred", "obj", "corrupt_side",
        F.coalesce("neg_subj", F.col("subj")).alias("nh"),
        F.coalesce("neg_obj", F.col("obj")).alias("nt"),
    )

    def emb_of(df, col, alias):
        e = ent_emb.select(
            F.col("id").alias(col), F.col("emb").alias(alias)
        )
        return df.join(e, col)

    j = emb_of(neg, "subj", "h")
    j = emb_of(j, "obj", "t")
    j = emb_of(j, "nh", "hn")
    j = emb_of(j, "nt", "tn")
    r = rel_emb.select(F.col("id").alias("pred"), F.col("emb").alias("r"))
    j = j.join(r, "pred")

    add = lambda a, b: F.zip_with(a, b, lambda x, y: x + y)
    sub = lambda a, b: F.zip_with(a, b, lambda x, y: x - y)
    pos = sub(add(F.col("h"), F.col("r")), F.col("t"))
    ngd = sub(add(F.col("hn"), F.col("r")), F.col("tn"))
    j = (
        j.withColumn("posd", pos)
        .withColumn("negd", ngd)
        .withColumn(
            "active",
            F.lit(float(margin)) + _sq_dist(add(F.col("h"), F.col("r")), F.col("t"))
            - _sq_dist(add(F.col("hn"), F.col("r")), F.col("tn"))
            > 0,
        )
        .where(F.col("active"))
    )
    two = F.lit(2.0)
    scale_vec = lambda v, s: F.transform(v, lambda x: x * s)
    # gradient pieces (see docstring): pos contributes +2*posd to h and
    # r, -2*posd to t; the corrupted pair contributes -2*negd to its
    # head and r... sign per side:
    g_pos = scale_vec(F.col("posd"), two)
    g_neg = scale_vec(F.col("negd"), two)
    neg_g = lambda v: F.transform(v, lambda x: -x)
    ent_contrib = F.array(
        F.struct(F.col("subj").alias("id"), g_pos.alias("g")),
        F.struct(F.col("obj").alias("id"), neg_g(g_pos).alias("g")),
        F.struct(F.col("nh").alias("id"), neg_g(g_neg).alias("g")),
        F.struct(F.col("nt").alias("id"), g_neg.alias("g")),
    )
    rel_contrib = F.struct(
        F.col("pred").alias("id"), sub(g_pos, g_neg).alias("g")
    )

    def grad_sum(contrib_rows):
        flat = contrib_rows.select(
            F.col("c.id").alias("id"),
            F.posexplode(F.col("c.g")).alias("dim_j", "g"),
        )
        per = flat.groupBy("id", "dim_j").agg(F.sum("g").alias("g"))
        return per.groupBy("id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim_j", "g"))),
                lambda s: s["g"],
            ).alias("grad")
        )

    eg = grad_sum(
        j.select(F.explode(ent_contrib).alias("c"))
    )
    rg = grad_sum(j.select(rel_contrib.alias("c")))

    def apply_update(emb, grads):
        lrl = F.lit(float(lr))
        return emb.join(grads, "id", "left").select(
            "id",
            F.when(F.col("grad").isNull(), F.col("emb"))
            .otherwise(
                F.zip_with(F.col("emb"), F.col("grad"),
                           lambda e, g: e - lrl * g)
            )
            .alias("emb"),
        )

    return apply_update(ent_emb, eg), apply_update(rel_emb, rg)


def transe_loss(
    edges: DataFrame,
    ent_emb: DataFrame,
    rel_emb: DataFrame,
    margin: float = 1.0,
    seed: str = "ep0",
    buckets: int = 64,
    negatives: DataFrame | None = None,
) -> DataFrame:
    """Single-row (n_pairs, mean_hinge) evaluation of the epoch's
    objective — the convergence probe for an epoch loop."""
    from .negatives import negative_triples

    if negatives is None:
        negatives = negative_triples(edges, n_neg=1, seed=seed,
                                     buckets=buckets)
    neg = negatives.select(
        "subj", "pred", "obj",
        F.coalesce("neg_subj", F.col("subj")).alias("nh"),
        F.coalesce("neg_obj", F.col("obj")).alias("nt"),
    )

    def emb_of(df, col, alias):
        e = ent_emb.select(F.col("id").alias(col), F.col("emb").alias(alias))
        return df.join(e, col)

    j = emb_of(neg, "subj", "h")
    j = emb_of(j, "obj", "t")
    j = emb_of(j, "nh", "hn")
    j = emb_of(j, "nt", "tn")
    j = j.join(
        rel_emb.select(F.col("id").alias("pred"), F.col("emb").alias("r")),
        "pred",
    )
    add = lambda a, b: F.zip_with(a, b, lambda x, y: x + y)
    hinge = F.greatest(
        F.lit(0.0),
        F.lit(float(margin))
        + _sq_dist(add(F.col("h"), F.col("r")), F.col("t"))
        - _sq_dist(add(F.col("hn"), F.col("r")), F.col("tn")),
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.avg(hinge).alias("mean_hinge"),
    )
