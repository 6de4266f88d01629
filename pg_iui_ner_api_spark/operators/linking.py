"""Entity linking: candidate generation + embedding rerank (SURVEY.md J3/M5).

Stage shape:

    mentions  ⋈ broadcast(alias_dict)  on lower(word)=lower(alias)   # J3
             ⋈ broadcast(entity_emb)   on entity_id
      ctx_bow = JVM higher-order BoW encoding of the mention's context
                string over the closed descriptor vocabulary
      emb_sim = <ctx_bow/||ctx_bow||, entity_emb>   # entity embs are
                unit vectors, so this IS the cosine — pure JVM, no UDF
      score   = 0.7*emb_sim + 0.3*prior
      links   = argmax per mention (max_by)     # one shuffle on mention_id

Scale properties:

  * The alias dictionary and entity-embedding table are small dimensions
    (≤ millions of rows in production): both join broadcast, so the
    100 TB mention table never shuffles here.
  * Only a narrow (mention_id, word, ctx) projection flows through the
    candidate join and the per-mention argmax; the fat mention row is
    joined back once at the end. No embedding vector is ever shuffled
    or Arrow-transferred — the stand-in encoder is Column algebra, and
    a real transformer encoder would slot in as an Arrow-batched
    scalar-iterator pandas UDF at the same seam (per-worker model
    singleton, cf. operators/tagger.HFTagger).
  * AQE skew-join splitting covers hub surfaces ('Acme') in the
    candidate join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..synth import EMB_DIM, VOCAB


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


def _vocab_idx_map() -> Column:
    """Literal map token -> 1-based index into the entity embedding."""
    pairs: list[Column] = []
    for tok, i in VOCAB.items():
        pairs.extend((F.lit(tok), F.lit(i + 1)))
    return F.create_map(*pairs)


def rerank(cands: DataFrame, entity_emb_df: DataFrame) -> DataFrame:
    """Dense rerank (M5): cosine(encode(ctx), entity_emb) without leaving
    the JVM — the context encoding AND the dot product are Column
    expressions (tests pin the plan to zero Python nodes).

    Cost discipline: the context window holds ~6 tokens, so instead of
    materializing an EMB_DIM-wide BoW vector (which would re-scan the
    token list per vocab slot), iterate the DISTINCT context tokens:
    dot  = Σ_t count(t) · ent_emb[idx(t)]      (idx via a literal map)
    ‖c‖² = Σ_t count(t)²   over in-vocabulary t only
    — semantics identical to synth.embed_text's normalized BoW cosine,
    with O(|ctx tokens|²) work per row, not O(EMB_DIM·|ctx|).
    """
    e = F.broadcast(entity_emb_df.select("entity_id", F.col("emb").alias("ent_emb")))
    idx_map = _vocab_idx_map()
    toks = F.filter(F.split(F.lower(F.col("ctx")), r"[^\w]+"), lambda t: t != "")
    scored = (
        cands.join(e, "entity_id", "left")
        .withColumn("_toks", toks)
        .withColumn("_dtoks", F.array_distinct("_toks"))
    )

    def cnt(t: Column) -> Column:
        return F.size(F.filter(F.col("_toks"), lambda x: x == t)).cast("double")

    def idx(t: Column) -> Column:
        return F.element_at(idx_map, t)

    dot = F.aggregate(
        "_dtoks",
        F.lit(0.0),
        lambda acc, t: acc
        + F.when(
            idx(t).isNotNull(),
            cnt(t) * F.coalesce(F.element_at("ent_emb", idx(t)).cast("double"), F.lit(0.0)),
        ).otherwise(F.lit(0.0)),
    )
    norm2 = F.aggregate(
        "_dtoks",
        F.lit(0.0),
        lambda acc, t: acc + F.when(idx(t).isNotNull(), cnt(t) * cnt(t)).otherwise(F.lit(0.0)),
    )
    emb_sim = F.when(
        F.col("ctx").isNotNull() & F.col("ent_emb").isNotNull() & (norm2 > 0),
        dot / F.sqrt(norm2),
    ).otherwise(F.lit(0.0))
    return (
        scored.withColumn("emb_sim", emb_sim)
        .withColumn("link_score", 0.7 * F.col("emb_sim") + 0.3 * F.col("prior"))
        .drop("_toks", "_dtoks")
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
    ever emits entities its label space knows). The ctx column is
    consumed here and dropped from the output — downstream stages never
    carry it.
    """
    slim = mentions.select("mention_id", "word", "ctx")
    scored = rerank(candidates(slim, alias_df), entity_emb_df)
    l = links(scored)
    return mentions.drop("ctx").join(l, "mention_id", "inner")
