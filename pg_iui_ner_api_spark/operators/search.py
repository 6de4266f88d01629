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


def collocations(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` adjacent-bigram collocations by pointwise mutual
    information — phrase mining for vocabulary/tokenizer construction
    ("new york" is one unit; "of the" is not, despite its count).

    Distinct from graph.cooccurrence_pmi, which scores SET co-occurrence
    within a group key: this scores ORDERED ADJACENCY within the token
    stream, the Church & Hanks (1990) collocation statistic.

    pmi(a,b) = ln( (c_ab / N_bigrams) / ((c_a / N) * (c_b / N)) ), kept
    as one float expression over exact integer counts so both engines
    evaluate an identical IEEE DAG; ranked by (rounded pmi desc, w1, w2)
    for engine-stable order. ``min_count`` prunes the noise floor (PMI
    is maximal for hapax pairs) BEFORE any join.

    100 TB shape: ONE heavy pass total. Each token pairs in-row with its
    successor-or-NULL (doc-final tokens keep a NULL successor), so a
    single (w1, w2) count aggregation carries every statistic: bigram
    counts are the w2-non-null rows, unigram counts are its w1-marginal
    (every token occurs exactly once as w1), and both scalar totals are
    sums over it. That aggregation is localCheckpointed (the repo's
    standard reuse barrier — same tier as minhash's signature
    checkpoint: observed-pair-vocabulary-sized, NOT corpus-sized), so
    the corpus tokenize→explode→count runs exactly once even though
    four consumers branch from it — plan-reuse via ReuseExchange is
    defeated here by join null-filters pushing different predicates
    into each branch. The remaining joins run on vocabulary-sized
    tables (AQE broadcasts); top-k is TakeOrdered.
    """
    toks = tokens(normalize_ws(F.col(text_col)))
    n_1 = F.greatest(F.size(toks) - 1, F.lit(0))
    nxt = F.concat(
        F.slice(toks, 2, n_1), F.array(F.lit(None).cast("string"))
    )
    pcnt = (
        docs.select(
            F.explode(
                F.zip_with(
                    toks, nxt,
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        # w1 NULL only from zip_with padding an EMPTY token array
        .where(F.col("w1").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    ).localCheckpoint()
    ucnt = pcnt.groupBy("w1").agg(F.sum("c").alias("c")).withColumnRenamed(
        "w1", "w"
    )
    totals = pcnt.agg(
        F.sum("c").alias("n_uni"),
        F.sum(F.when(F.col("w2").isNotNull(), F.col("c"))).alias("n_big"),
    )
    pruned = (
        pcnt.where(F.col("w2").isNotNull() & (F.col("c") >= int(min_count)))
        .withColumnRenamed("c", "c_ab")
    )
    j = (
        pruned.join(ucnt.withColumnRenamed("w", "w1").withColumnRenamed("c", "c_a"), "w1")
        .join(ucnt.withColumnRenamed("w", "w2").withColumnRenamed("c", "c_b"), "w2")
        .crossJoin(F.broadcast(totals))
    )
    num = (
        F.col("c_ab").cast("double")
        * F.col("n_uni").cast("double")
        * F.col("n_uni").cast("double")
    )
    den = (
        F.col("n_big").cast("double")
        * F.col("c_a").cast("double")
        * F.col("c_b").cast("double")
    )
    scored = j.select(
        "w1", "w2", "c_ab", "c_a", "c_b",
        F.round(F.log(num / den), 6).alias("pmi"),
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(int(k))
