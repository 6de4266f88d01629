"""Knowledge fusion — multi-source triple confidence aggregation.

The KG pipeline emits one (subj, pred, obj) row per *extraction*
(``operators/triples.py``; reference analogue: the per-request entity
rows of /root/reference/src/routers/main_endpoints.py:129-176, one set
per document). At corpus scale the same fact is extracted from many
documents with varying extractor scores, and the canonical KG wants ONE
row per fact with a fused confidence — the classic knowledge-fusion
step (Dong et al., "From Data Fusion to Knowledge Fusion", VLDB 2014).

``fuse_triples`` is a single partial-aggregable groupBy on the triple
key — map-side combine collapses per-partition duplicates before the
shuffle, so the shuffle carries one narrow row per distinct
(subj, pred, obj) per partition, never the raw extraction stream:

  * ``n_mentions``   — total supporting extractions,
  * ``n_docs``       — distinct supporting documents
                       (exact here; at 100 TB swap in approx_count_distinct —
                       the query shape is unchanged),
  * ``max_score``/``min_score`` — exact order statistics (no float-sum
                       order dependence),
  * ``noisy_or``     — 1 - prod(1 - score): the standard independent-
                       evidence fusion score. Computed as
                       exp(sum(ln(1-s))) so it stays a partial-aggregable
                       SUM (a product aggregate would not be built in);
                       scores are clamped to <= 1 - 1e-9 so ln never hits
                       -inf on a "certain" extraction.

Zero Python, zero windows, ONE shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_EPS = 1e-9


def fuse_triples(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    score: str = "score",
    doc: str = "doc_id",
) -> DataFrame:
    """(one row per extraction) -> (one row per distinct triple).

    Output: (subj, pred, obj, n_mentions, n_docs, max_score, min_score,
    noisy_or), noisy_or in [0, 1).
    """
    s = F.least(F.col(score).cast("double"), F.lit(1.0 - _EPS))
    return triples.groupBy(subj, pred, obj).agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.countDistinct(doc).alias("n_docs"),
        F.max(score).alias("max_score"),
        F.min(score).alias("min_score"),
        (F.lit(1.0) - F.exp(F.sum(F.log(F.lit(1.0) - s)))).alias("noisy_or"),
    )


def functional_violations(
    triples: DataFrame,
    functional_preds: list[str],
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """KG integrity check: subjects that bind a FUNCTIONAL predicate
    (one declared to admit exactly one object — birth date, capital,
    canonical id) to more than one distinct object:
    ``(subj, pred, n_objs)``.

    The standard post-fusion quality gate (OWL functional-property
    semantics): violations are either extraction errors to route back
    to review or genuine conflicts for a resolution policy.

    ONE partial-aggregable groupBy on (subj, pred) after an in-scan
    predicate filter (pushed to the source when `triples` is a scan);
    the shuffle carries distinct-count partials, never objects.
    """
    return (
        triples.where(F.col(pred).isin(functional_preds))
        .groupBy(subj, pred)
        .agg(F.countDistinct(obj).alias("n_objs"))
        .where(F.col("n_objs") > 1)
    )


def entity_report(
    triples: DataFrame,
    s_col: str = "subj",
    p_col: str = "pred",
    o_col: str = "obj",
) -> DataFrame:
    """Per-entity KG report card: ``(entity, n_out, n_in, n_total,
    n_out_preds, top_out_pred, top_in_pred)`` over the DISTINCT triple
    set — the entity-level twin of the corpus report card: reviewers
    gate canonicalization on it (an entity whose top_in_pred is an
    identity-like predicate with huge n_in is usually an under-merged
    hub alias; one with wildly polymorphic out-predicates an
    over-merge).

    Modal predicates tie-break to the lexicographically smallest via
    ``min(struct(-count, pred))`` — deterministic and identical to the
    oracle's row_number ordering. Scale shape: two partial-aggregable
    (entity, pred) aggregations + one merge join on the entity id; no
    windows over raw triples, output is entity-vocabulary sized.
    """
    t = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    ).distinct()

    def side(keyed: DataFrame, key: str, prefix: str) -> DataFrame:
        per_pred = keyed.groupBy(key, "p").agg(
            F.count(F.lit(1)).alias("c")
        )
        return per_pred.groupBy(F.col(key).alias("entity")).agg(
            F.sum("c").alias(f"n_{prefix}"),
            F.count(F.lit(1)).alias(f"n_{prefix}_preds"),
            F.min(F.struct((-F.col("c")).alias("nc"), F.col("p"))).getField(
                "p"
            ).alias(f"top_{prefix}_pred"),
        )
    out = side(t.select("s", "p"), "s", "out")
    inn = side(t.select("o", "p"), "o", "in")
    joined = out.join(inn, "entity", "full")
    zero = F.lit(0).cast("long")
    return joined.select(
        "entity",
        F.coalesce("n_out", zero).alias("n_out"),
        F.coalesce("n_in", zero).alias("n_in"),
        (F.coalesce("n_out", zero) + F.coalesce("n_in", zero)).alias("n_total"),
        F.coalesce("n_out_preds", zero).alias("n_out_preds"),
        "top_out_pred",
        "top_in_pred",
    )
