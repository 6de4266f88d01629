"""Count-based language-model scoring for corpus quality filtering.

The CCNet / Gopher pipelines rank web documents by the perplexity of a
small language model trained on a trusted corpus and keep the
best-scoring tail; this module is that filter re-expressed as pure
DataFrame algebra — a word-bigram model with add-one (Laplace)
smoothing, trained BY the engine on the corpus itself (or any reference
corpus) in one aggregation pass, then applied map-side-ish via two
hash-keyed joins. No Python crosses the plan.

Model:  P(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)
score:  avg over a doc's bigrams of ln P  (higher = more typical text;
        the pipeline drops the low tail, same contract as
        ``quality_score`` / ``quality_model_score``)

Scale shape (the whole point — at 100 TB the naive form dies on the
token shuffle):

* bigrams are md5-hashed IN-ROW to 8-byte ints before anything
  explodes, so the count shuffles and the score joins carry (h, 8B)
  rows, never token text — the same discipline as ``top_ngram_stats``
  and ``repeated_spans``;
* count tables are plain partial-aggregable groupBys: a stop-word
  bigram occurring 10^10 times collapses map-side;
* the vocabulary size V is a single-row aggregate broadcast back into
  the scoring expression (same single-row-stats shape as BM25's corpus
  constants, operators/search.py);
* the exploded bigram table has three consumers (c2, c1, the scoring
  join), so it is localCheckpoint'd once rather than recomputed —
  the checkpoint holds (doc_id, 2×8-byte hashes) per token, a ~2%
  tax on corpus bytes.

Hash collisions (~2^-60 per pair) merge two bigrams' counts; the
DuckDB oracle replays the identical md5 scheme so the comparison is
exact. The final avg is rounded to 4 decimals on BOTH engines — the
one float whose partition-order summation could differ in the last
ulps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import normalize_ws, portable_hash64, spread, tokens


def doc_bigrams(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, h1, h12) — one row per interior bigram occurrence.

    h1 hashes the first word, h12 the space-joined pair. Tokens are
    bound to a real column before the lambda so the regex split runs
    once per row, not once per element (the ``_with_shingles`` /
    ``repeated_spans`` evaluation-cost trap).
    """
    base = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        tokens(normalize_ws(F.col(text_col))).alias("_toks"),
    )
    toks = F.col("_toks")
    n = F.size(toks)
    pair = lambda i: F.struct(  # noqa: E731
        portable_hash64(F.element_at(toks, i)).alias("h1"),
        portable_hash64(
            F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1))
        ).alias("h12"),
    )
    bg = F.when(
        n >= 2, F.transform(F.sequence(F.lit(1), n - 1), pair)
    ).otherwise(F.array().cast("array<struct<h1:long,h12:long>>"))
    return (
        base.select("doc_id", F.explode(bg).alias("bg"))
        .select("doc_id", F.col("bg.h1").alias("h1"), F.col("bg.h12").alias("h12"))
    )


def lm_score(docs: DataFrame, id_col: str = "doc_id",
             text_col: str = "text",
             train_docs: DataFrame | None = None) -> DataFrame:
    """(doc_id, n_bigrams, avg_logp) for every doc with >= 1 bigram.

    ``train_docs`` defaults to ``docs`` (self-trained corpus model, the
    common curation setup); pass a trusted reference corpus for the
    CCNet arrangement. Docs shorter than two tokens have no bigrams and
    emit nothing — count them upstream with ``token_stats``.
    """
    bi = doc_bigrams(docs, id_col, text_col)
    if train_docs is None:
        # three consumers (c2, c1, scoring join) — materialize once
        bi = bi.localCheckpoint()
        train = bi
    else:
        # external corpus still has two consumers (c2, c1) — checkpoint
        # it too, or the whole tokenize+hash pass over the trusted
        # corpus runs twice
        train = doc_bigrams(train_docs, id_col, text_col).localCheckpoint()
    c2 = train.groupBy("h12").agg(F.count(F.lit(1)).alias("cnt2"))
    c1 = train.groupBy("h1").agg(F.count(F.lit(1)).alias("cnt1"))
    vocab = c1.agg(F.count(F.lit(1)).alias("v"))  # distinct first-words
    # LEFT joins so a bigram unseen in training scores the smoothed
    # floor (0+1)/(c1+V) — and an unseen first-word 1/V — instead of
    # silently vanishing; with self-training the joins always hit.
    return (
        bi.join(c2, "h12", "left")
        .join(c1, "h1", "left")
        .join(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(
                    F.log(
                        (F.coalesce(F.col("cnt2"), F.lit(0)) + 1.0)
                        / (F.coalesce(F.col("cnt1"), F.lit(0)) + F.col("v"))
                    )
                ),
                4,
            ).alias("avg_logp"),
        )
    )
