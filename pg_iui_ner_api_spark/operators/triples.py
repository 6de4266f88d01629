"""Triple assembly (SURVEY.md J5): (subj, pred, obj) from linked mentions.

Semantics (matches the synthetic ground truth AND the reference-
semantics oracle in tests/oracle.py): for every predicate-phrase
occurrence p in a sentence,

    subj = linked mention with the greatest `end` <= p.start  (nearest left)
    obj  = linked mention with the smallest `start` >= p.end  (nearest right)

both within the same (doc_id, span_idx, sentence_id). Triples with a
missing side are dropped.

Plan: two co-keyed shuffles (join + max_by / min_by aggregation) on the
composite sentence key — no applyInPandas, no per-row Python. Both
joins key on a doc_id-prefixed composite, so data locality follows the
corpus's doc_id hash partitioning; AQE coalesces the small side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SENT_KEY = ["doc_id", "span_idx", "sentence_id"]


def assemble_triples(linked_mentions: DataFrame, predicates: DataFrame) -> DataFrame:
    lm = linked_mentions.select(
        *_SENT_KEY,
        F.col("start").alias("m_start"),
        F.col("end").alias("m_end"),
        "entity_id",
    )
    p = predicates.select(
        *_SENT_KEY,
        "pred",
        F.col("start").alias("p_start"),
        F.col("end").alias("p_end"),
    )
    pk = _SENT_KEY + ["pred", "p_start", "p_end"]

    paired = p.join(lm, _SENT_KEY, "inner")

    subj = (
        paired.where(F.col("m_end") <= F.col("p_start"))
        .groupBy(*pk)
        .agg(F.max_by("entity_id", F.struct("m_end", "entity_id")).alias("subj"))
    )
    obj = (
        paired.where(F.col("m_start") >= F.col("p_end"))
        .groupBy(*pk)
        .agg(F.min_by("entity_id", F.struct("m_start", "entity_id")).alias("obj"))
    )
    return (
        subj.join(obj, pk, "inner")
        .select(
            "subj",
            "pred",
            "obj",
            "doc_id",
            F.concat_ws(":", "doc_id", "span_idx", "p_start").alias("evidence"),
        )
    )
