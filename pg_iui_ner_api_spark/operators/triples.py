"""Triple assembly (SURVEY.md J5): (subj, pred, obj) from linked mentions.

Semantics (matches the synthetic ground truth AND the reference-
semantics oracle in tests/oracle.py): for every predicate-phrase
occurrence p in a sentence,

    subj = linked mention with the greatest `end` <= p.start  (nearest left;
           ties on `end` broken toward the larger entity_id)
    obj  = linked mention with the smallest `start` >= p.end  (nearest right;
           ties on `start` broken toward the smaller entity_id)

both within the same (doc_id, span_idx, sentence_id). Triples with a
missing side are dropped.

Physical plan: an as-of pass — mentions and predicates union into one
event stream per sentence; two window sorts compute nearest-left /
nearest-right via last(..., ignorenulls). ONE exchange on the sentence
key + two sorts, replacing the previous join + two aggregations + join
(4 exchanges). The sentence key is doc_id-prefixed, so partitioning
follows the corpus's doc_id hash partitioning and AQE handles residual
skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_SENT_KEY = ["doc_id", "span_idx", "sentence_id"]


def assemble_triples(linked_mentions: DataFrame, predicates: DataFrame) -> DataFrame:
    m = linked_mentions.select(
        *_SENT_KEY,
        F.col("start").alias("m_start"),
        F.col("end").alias("m_end"),
        "entity_id",
        F.lit(None).cast("string").alias("pred"),
        F.lit(None).cast("int").alias("p_start"),
        F.lit(None).cast("int").alias("p_end"),
    )
    p = predicates.select(
        *_SENT_KEY,
        F.lit(None).cast("int").alias("m_start"),
        F.lit(None).cast("int").alias("m_end"),
        F.lit(None).cast("string").alias("entity_id"),
        "pred",
        F.col("start").alias("p_start"),
        F.col("end").alias("p_end"),
    )
    ev = m.unionByName(p)

    # nearest-left: order by position where a mention sits at its END
    # offset and a predicate at its START; mentions sort before a
    # predicate at the same offset (is_pred tiebreak), so `m_end <=
    # p_start` is inclusive. Among equal m_end, entity_id ASC puts the
    # MAX entity last — last() picks it (max_by tie rule).
    left_pos = F.coalesce("m_end", "p_start")
    w_left = Window.partitionBy(*_SENT_KEY).orderBy(
        left_pos.asc(),
        F.col("pred").isNotNull().cast("int").asc(),
        F.col("entity_id").asc_nulls_first(),
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # nearest-right: descending positions, mention at its START offset,
    # predicate at its END; inclusive `m_start >= p_end`; among equal
    # m_start, entity_id DESC puts the MIN entity last (min_by rule).
    right_pos = F.coalesce("m_start", "p_end")
    w_right = Window.partitionBy(*_SENT_KEY).orderBy(
        right_pos.desc(),
        F.col("pred").isNotNull().cast("int").asc(),
        F.col("entity_id").desc_nulls_first(),
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)

    out = (
        ev.withColumn("subj", F.last("entity_id", ignorenulls=True).over(w_left))
        .withColumn("obj", F.last("entity_id", ignorenulls=True).over(w_right))
        .where(F.col("pred").isNotNull() & F.col("subj").isNotNull() & F.col("obj").isNotNull())
    )
    return out.select(
        "subj",
        "pred",
        "obj",
        "doc_id",
        F.concat_ws(":", "doc_id", "span_idx", "p_start").alias("evidence"),
    )
