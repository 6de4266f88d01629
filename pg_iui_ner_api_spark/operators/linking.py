"""Entity linking: candidate generation + embedding rerank (SURVEY.md J3/M5).

Stage shape:

    mentions  ⋈ broadcast(alias_dict)  on lower(word)=lower(alias)   # J3
             ⋈ broadcast(entity_emb)   on entity_id
      emb_sim = <ctx_emb, entity_emb>          # both unit-normed, so the
                                               # dot product IS the cosine;
                                               # computed with zip_with +
                                               # aggregate — pure JVM, no UDF
      score   = 0.6*emb_sim + 0.4*prior
      links   = argmax per mention (max_by)     # one shuffle on mention_id

The alias dictionary and entity-embedding table are small dimensions
(≤ millions of rows at production scale): both are explicit
``broadcast()`` joins, so the 100 TB mention table never shuffles here.
The only shuffle is the final per-mention argmax, and AQE's skew-join
splitting covers hub surfaces ('Acme') in the candidate join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def candidates(mentions: DataFrame, alias_df: DataFrame) -> DataFrame:
    """Mention surface -> candidate entities. Broadcast hash join (J3)."""
    a = F.broadcast(
        alias_df.select(
            F.lower("alias").alias("alias_norm"),
            "alias",
            "entity_id",
            "kind",
            "canonical_name",
            "prior",
        )
    )
    return mentions.join(a, F.lower(mentions.word) == a.alias_norm, "inner")


def rerank(cands: DataFrame, entity_emb_df: DataFrame) -> DataFrame:
    """Dense rerank (M5): cosine(ctx_emb, entity_emb) without leaving the JVM."""
    e = F.broadcast(entity_emb_df.select("entity_id", F.col("emb").alias("ent_emb")))
    scored = cands.join(e, "entity_id", "left")
    dot = F.aggregate(
        F.zip_with("ctx_emb", "ent_emb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    emb_sim = F.when(
        F.col("ctx_emb").isNotNull() & F.col("ent_emb").isNotNull(), dot
    ).otherwise(F.lit(0.0))
    return scored.withColumn("emb_sim", emb_sim).withColumn(
        "link_score", 0.7 * F.col("emb_sim") + 0.3 * F.col("prior")
    )


def links(scored: DataFrame) -> DataFrame:
    """Top-1 candidate per mention. Single shuffle on mention_id; ties break
    deterministically on entity_id so reruns are byte-identical."""
    best = F.max_by(
        F.struct(
            F.col("entity_id"),
            F.col("kind").alias("link_kind"),
            F.col("canonical_name"),
            F.col("link_score"),
        ),
        F.struct(F.col("link_score"), F.col("entity_id")),
    ).alias("best")
    return (
        scored.groupBy("mention_id")
        .agg(best)
        .select(
            "mention_id", "best.entity_id", "best.link_kind",
            "best.canonical_name", "best.link_score",
        )
    )


def link_mentions(mentions: DataFrame, alias_df: DataFrame, entity_emb_df: DataFrame) -> DataFrame:
    """mentions + alias dict + embeddings -> linked mentions.

    Returns the mention rows augmented with (entity_id, canonical_name,
    link_kind, link_score); mentions whose surface is out-of-dictionary
    are dropped (NIL linking — same behavior as the reference, which only
    ever emits entities its label space knows).
    """
    scored = rerank(candidates(mentions, alias_df), entity_emb_df)
    l = links(scored)
    return mentions.join(l, "mention_id", "inner")
