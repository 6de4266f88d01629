"""Distant-supervision training-pair export (Mintz et al., ACL 2009).

The KG pipeline's outputs close the loop on their own extractor: every
sentence containing linked mentions of two entities that the KG relates
becomes a labeled relation-classifier training instance, and unrelated
co-occurring pairs become the NA (no-relation) class. This is the
standard way a 10^12-document corpus plus a seed KG bootstraps a
learned relation extractor to replace/augment the pattern-based
predicate matcher (``operators/ner.py``'s predicate rows).

Semantics: for every ORDERED pair of distinct linked mentions in the
same sentence, emit one row; ``label`` is the KG predicate for
(subj_entity, obj_entity) when asserted (every matching predicate gets
its own row — multi-label sentences are real), else the NA label when
``include_negatives``. Multiple mentions of the same entity pair in a
sentence are distinct instances (they carry different offsets — the
features a trainer consumes).

Scale shape: the mention self-join is keyed by the sentence composite
(doc_id-prefixed, so it follows the corpus partitioning) and its fan is
quadratic in mentions-per-sentence — bounded by ``max_per_sentence``
with the house drop-report contract (:func:`distant_dropped_sentences`,
never silent). The relation set joins on the (subj, obj) entity pair —
entity-vocabulary sized, usually broadcastable, left to AQE. The
subject mention's extractor context window (``ctx`` — the tagger's
truncated window around the mention, not the whole sentence) attaches
via ONE mention_id equi-join against the extraction rows (co-keyed with
the pipeline's bucketing), so ctx strings never ride the self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SENT = ["doc_id", "span_idx", "sentence_id"]


def _bounded_sentences(lm: DataFrame, max_per_sentence: int, keep: bool):
    per = lm.groupBy(*_SENT).agg(F.count(F.lit(1)).alias("n_mentions"))
    if keep:
        return per.where(F.col("n_mentions") <= max_per_sentence).drop(
            "n_mentions"
        )
    return per.where(F.col("n_mentions") > max_per_sentence)


def distant_pairs(
    linked_mentions: DataFrame,
    edges: DataFrame,
    ctx_source: DataFrame | None = None,
    max_per_sentence: int = 32,
    include_negatives: bool = True,
    neg_label: str = "NA",
) -> DataFrame:
    """Build the training-pair table; see module docstring.

    ``edges`` needs (subj, pred, obj); ``ctx_source`` (optional) is any
    frame with (mention_id, ctx) — e.g. ``ner.mentions_of(extraction)``
    — to attach the subject mention's context window as ``subj_ctx``.
    """
    lm = linked_mentions.select(
        *_SENT, "mention_id", "entity_id", "word", "start"
    )
    ok = _bounded_sentences(lm, max_per_sentence, keep=True)
    lm = lm.join(ok, _SENT)

    a = lm.select(
        *_SENT,
        F.col("mention_id").alias("subj_mention_id"),
        F.col("entity_id").alias("subj_entity"),
        F.col("word").alias("subj_word"),
        F.col("start").alias("subj_start"),
    )
    b = lm.select(
        *_SENT,
        F.col("mention_id").alias("obj_mention_id"),
        F.col("entity_id").alias("obj_entity"),
        F.col("word").alias("obj_word"),
        F.col("start").alias("obj_start"),
    )
    pairs = a.join(b, _SENT).where(
        F.col("subj_mention_id") != F.col("obj_mention_id")
    )

    rel = edges.select(
        F.col("subj").alias("subj_entity"),
        F.col("pred").alias("label"),
        F.col("obj").alias("obj_entity"),
    ).distinct()
    how = "left" if include_negatives else "inner"
    labeled = pairs.join(rel, ["subj_entity", "obj_entity"], how)
    if include_negatives:
        labeled = labeled.withColumn(
            "label", F.coalesce("label", F.lit(neg_label))
        )

    if ctx_source is not None:
        ctx = ctx_source.select(
            F.col("mention_id").alias("subj_mention_id"),
            F.col("ctx").alias("subj_ctx"),
        )
        # LEFT join: a pair whose subject mention has no ctx row keeps
        # its row with subj_ctx null — an inner join here silently
        # dropped such pairs, contradicting the module's never-silent
        # contract (r4 ADVICE).
        labeled = labeled.join(ctx, "subj_mention_id", "left")
    return labeled.select(
        *_SENT,
        "subj_mention_id",
        "obj_mention_id",
        "subj_entity",
        "obj_entity",
        "subj_word",
        "obj_word",
        "subj_start",
        "obj_start",
        "label",
        *(["subj_ctx"] if ctx_source is not None else []),
    )


def distant_dropped_sentences(
    linked_mentions: DataFrame, max_per_sentence: int = 32
) -> DataFrame:
    """The never-silent half of the :func:`distant_pairs` cap contract:
    ``(doc_id, span_idx, sentence_id, n_mentions)`` for every sentence
    the mention-pair fan-out cap excluded."""
    lm = linked_mentions.select(*_SENT, "mention_id")
    return _bounded_sentences(lm, max_per_sentence, keep=False)
