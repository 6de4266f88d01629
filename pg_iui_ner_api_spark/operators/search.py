"""Full-text relevance search: BM25 scoring and top-k retrieval.

Provenance: the reference retrieves documents only by primary key
(/root/reference/src/utils/crud.py:62-77); content-relevance retrieval
over the corpus is engine-side new work — the lexical complement to the
embedding ANN operators (operators/ann.py) that a training-data
pipeline needs for targeted corpus slicing ("all docs about X").

100 TB shape (two corpus scans, zero wide shuffles):
- Per-doc term frequencies are IN-ROW higher-order-function counts over
  the token array — the query's term list is a small literal, so tf
  computation never explodes tokens and never shuffles text.
- Corpus statistics (N, avgdl, per-term document frequency) reduce to a
  SINGLE row via one aggregation, then rejoin as a broadcast of that
  one row — the classic scan→tiny-stats→rebroadcast pattern. No
  inverted index is materialized or shuffled.
- Top-k is `orderBy(...).limit(k)`: Spark executes it as per-partition
  TakeOrdered (k rows per task cross the wire, not the corpus).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import normalize_ws, tokens


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score) for every doc matching >= 1 query term.

    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))  — the Robertson/
    Sparck-Jones BM25+ variant (always positive). Matching is over
    whitespace tokens of the lowercased, whitespace-normalized text;
    query terms are lowercased to match.
    """
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokens(normalize_ws(F.col(text_col)))

    def _tf(term: str):
        # single-arg closure: pyspark HOFs infer lambda arity from the
        # signature, so a `lambda x, t=t:` default-arg trick would turn
        # this into an (element, index) lambda
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        *[_tf(t).alias(f"_tf{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    j = base.crossJoin(F.broadcast(stats))
    contribs = []
    for i in range(len(terms)):
        tf, df = F.col(f"_tf{i}"), F.col(f"_df{i}")
        idf = F.log(
            F.lit(1.0) + (F.col("n_docs") - df + 0.5) / (df + 0.5)
        )
        norm = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
        )
        contribs.append(idf * (tf * F.lit(k1 + 1.0)) / norm)
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    matched = F.greatest(*[F.col(f"_tf{i}") for i in range(len(terms))]) > 0 \
        if len(terms) > 1 else F.col("_tf0") > 0
    return j.where(matched).select("doc_id", score.alias("score"))


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` docs by BM25 score (ties broken by ascending doc_id so
    the result is deterministic across engines); score rounded to 6dp.
    """
    scored = bm25_scores(docs, query_terms, k1, b, id_col, text_col)
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-``k`` distinctive terms by tf-idf — corpus-scale
    keyword extraction (the labeling complement to bm25_topk: BM25 ranks
    docs for a given query; this ranks terms for every doc).

    score(t, d) = tf(t, d) · ln(N / df(t)), ranked per doc by
    (rounded score desc, term asc) so ordering is deterministic and
    engine-portable; a term present in every doc scores exactly 0.

    100 TB shape: one token explode feeding a (doc_id, term) count —
    tokens ride exactly ONE shuffle as (term, 8-byte count) pairs, never
    full texts; df is a second narrow aggregation of that table (input:
    one row per distinct doc-term, already far smaller than the corpus);
    N is a single broadcast row; the per-doc top-k window partitions by
    doc_id, whose partitions are vocabulary-of-one-doc sized — no global
    sort anywhere.
    """
    toks = tokens(normalize_ws(F.col(text_col)))
    t = docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
    tf = t.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n").cast("double") / F.col("df").cast("double")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= int(k))
        .select("doc_id", "term", "tf", "score")
    )


def build_inverted_index(
    docs: DataFrame,
    max_postings: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialized posting lists: one row per term with its document
    frequency and a capped, sorted doc-id posting list — the index-BUILD
    counterpart to bm25's index-free scoring (an offline inverted index
    is what turns repeated corpus slicing into metadata lookups).

    Returns (term, df, postings array, n_dropped) where ``postings`` is
    the ``max_postings`` smallest doc_ids and ``n_dropped = df -
    len(postings)`` — the explicit hub-term drop report, same contract
    as the co-occurrence cap (operators/graph.py): silent truncation at
    scale is how "covered everything" lies happen.

    100 TB shape: per-row ``array_distinct`` makes (term, doc) pairs
    unique WITHOUT a distinct shuffle; the one wide shuffle keys by term
    and carries (term, 8-byte doc_id) pairs only. The cap is enforced by
    a row_number window BEFORE collect_list, so a stopword's millions of
    postings sort-and-spill in the window (disk-friendly) instead of
    buffering inside a single aggregation value; the groupBy then
    collects at most ``max_postings`` rows per term with no further
    Exchange (it reuses the window's term partitioning).
    """
    toks = tokens(normalize_ws(F.col(text_col)))
    pairs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(toks)).alias("term"),
    )
    w_term = Window.partitionBy("term")
    ranked = pairs.select(
        "term",
        "doc_id",
        F.row_number().over(w_term.orderBy("doc_id")).alias("rn"),
        F.count(F.lit(1)).over(w_term).alias("df"),
    )
    return (
        ranked.where(F.col("rn") <= int(max_postings))
        .groupBy("term")
        .agg(
            F.max("df").alias("df"),
            F.sort_array(F.collect_list("doc_id")).alias("postings"),
        )
        .select(
            "term",
            "df",
            "postings",
            (F.col("df") - F.size("postings")).cast("long").alias("n_dropped"),
        )
    )
