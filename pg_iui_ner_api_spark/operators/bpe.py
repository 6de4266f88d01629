"""Distributed BPE tokenizer-vocabulary induction.

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units") learns a subword vocabulary by
repeatedly merging the most frequent adjacent symbol pair. Every LM
training pipeline runs exactly this before token counting, packing, or
cost estimation — and at corpus scale the naive formulation (rescan the
corpus per merge) is unusable. This module is the scale-correct
restatement:

1. **One corpus pass, ever.** The corpus collapses to a word-frequency
   table with a single shuffle on the word (`word_counts`); training
   then iterates on that table alone. A 100 TB corpus has a word table
   of ~10^7-10^8 rows — the 10^4-10^5x reduction is what makes
   iterating feasible, and it is exact: BPE statistics are a pure
   function of the word histogram.
2. **Per merge: one narrow aggregation + one in-row rewrite.** Pair
   counts explode the symbol arrays (weighted by word count) and
   groupBy the pair — partial-aggregable, shuffle rows are (two short
   symbols, 8-byte count). The argmax pair is a single-row collect
   (driver decision per iteration, same pattern as
   ``ann.train_centroids``), and the merge itself is a greedy
   left-to-right fold over each word's symbol array — pure Column
   algebra (``F.aggregate``), zero Python.
3. **Flat lineage.** The symbol table is localCheckpoint'd per merge,
   so iteration k plans against a materialized table, not k stacked
   rewrites.

Determinism: ties on pair count break lexicographically (count DESC,
left ASC, right ASC), so the learned merge sequence is a pure function
of the corpus — rerun-, partitioning-, and engine-stable. The pytest
oracle is an independent pure-Python BPE with the identical tie rule.

Scope notes: symbols are characters of whitespace-normalized words (no
end-of-word marker — a word boundary is already hard because merging
never crosses words); words longer than ``max_word_len`` chars are
excluded from TRAINING statistics (never silently: ``word_counts``
reports them via its ``dropped`` companion) — the standard guard
against pathological megabyte "words" blowing up the symbol arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import normalize_ws, spread, tokens


def word_counts(docs: DataFrame, text_col: str = "text",
                max_word_len: int = 64) -> DataFrame:
    """(word, wc) — corpus word histogram, the single corpus-wide pass."""
    base = spread(docs).select(
        F.explode(tokens(normalize_ws(F.col(text_col)))).alias("word")
    )
    return (
        base.where(F.length("word") <= max_word_len)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def dropped_words(docs: DataFrame, text_col: str = "text",
                  max_word_len: int = 64) -> DataFrame:
    """The never-silent half of the ``max_word_len`` guard:
    (word, wc) of every word training excluded."""
    base = spread(docs).select(
        F.explode(tokens(normalize_ws(F.col(text_col)))).alias("word")
    )
    return (
        base.where(F.length("word") > max_word_len)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _adjacent_pairs(syms_col):
    """array<string> -> array<struct<l,r>> of adjacent symbol pairs."""
    n = F.size(syms_col)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(syms_col, i).alias("l"),
                F.element_at(syms_col, i + 1).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def _merge_fold(syms_col, left: str, right: str):
    """Greedy left-to-right merge of the (left, right) pair — the exact
    scan order reference BPE implementations use, as a Column fold."""
    merged = left + right
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(docs: DataFrame, num_merges: int = 100, min_count: int = 2,
              text_col: str = "text",
              max_word_len: int = 64) -> tuple[DataFrame, DataFrame]:
    """Learn up to ``num_merges`` BPE merges from the corpus.

    Returns ``(merges, segmented)``:
      * ``merges`` — (rank, left, right, merged, pair_count), rank
        0-based in learn order;
      * ``segmented`` — (word, wc, pieces: array<string>), every
        training word segmented under the full learned merge sequence
        (a by-product of training — the loop maintains it exactly).

    Stops early when no pair reaches ``min_count``.
    """
    spark = docs.sparkSession
    wc = word_counts(docs, text_col, max_word_len)
    syms = wc.select(
        "word", "wc", F.split("word", "").alias("syms")
    ).localCheckpoint()
    learned: list[tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        top = (
            syms.select("wc", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("wc").alias("c"))
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_count:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["c"])
        learned.append((rank, left, right, left + right, cnt))
        prev = syms
        syms = prev.select(
            "word", "wc", _merge_fold(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint()
        # the superseded checkpoint would otherwise pile up in block
        # storage for num_merges iterations (same discipline as
        # triangle_count's unpersist of its oriented edge copy)
        prev.unpersist()
    merges = spark.createDataFrame(
        learned, schema="rank int, left string, right string, merged string, pair_count long"
    )
    return merges, syms.select("word", "wc", F.col("syms").alias("pieces"))


def bpe_vocab(segmented: DataFrame) -> DataFrame:
    """(piece, n_words, total_count) — the induced subword vocabulary
    with corpus frequencies, from ``bpe_train``'s segmentation table."""
    return (
        segmented.select("wc", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("wc").alias("total_count"),
        )
    )


def encode_words(words: DataFrame, merges: list[tuple[str, str]],
                 word_col: str = "word") -> DataFrame:
    """Segment each word under a learned merge sequence: adds
    ``pieces: array<string>``.

    Applies the merges in rank order, each as the same greedy
    left-to-right fold training used — so a word seen in training
    segments EXACTLY as ``bpe_train``'s ``segmented`` table says, and
    an unseen word segments deterministically with the identical rule.
    The k folds build one (deep) Column expression analyzed once, then
    evaluated in-row: zero Python, zero shuffles.
    """
    syms = F.split(F.col(word_col), "")
    for left, right in merges:
        syms = _merge_fold(syms, left, right)
    return words.withColumn("pieces", syms)


def bpe_token_count(docs: DataFrame, merges, id_col: str = "doc_id",
                    text_col: str = "text",
                    max_word_len: int = 64) -> DataFrame:
    """(doc_id, n_words, n_pieces) — token cost of every document under
    an induced vocabulary (``merges`` = ``bpe_train``'s merge table, or
    a rank-ordered list of (left, right) pairs).

    Scale shape: the k-fold encode expression runs over the DISTINCT
    word table, not the corpus — the corpus contributes one explode +
    one hash join on the word and a partial-aggregable per-doc sum, so
    duplicate words (most of any corpus, Zipf) are segmented once.
    Empty documents survive with n_words = n_pieces = 0 via the left
    join.

    Words longer than ``max_word_len`` (the same guard training uses —
    the vocab never saw them) bypass the k quadratic folds and count at
    the character-level fallback (n_pieces contribution = length): a
    single megabyte base64 "word" must not hang the whole stage inside
    a per-row O(k * len^2) fold.
    """
    if isinstance(merges, DataFrame):
        merges = [
            (r["left"], r["right"]) for r in merges.orderBy("rank").collect()
        ]
    words = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(tokens(normalize_ws(F.col(text_col)))).alias("word"),
    )
    short = (
        words.where(
            F.col("word").isNotNull() & (F.length("word") <= max_word_len)
        )
        .select("word")
        .distinct()
    )
    vocab = encode_words(short, merges).select(
        "word", F.size("pieces").alias("np")
    )
    return (
        words.join(vocab, "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.col("word")).alias("n_words"),
            F.coalesce(
                F.sum(F.coalesce(F.col("np"), F.length("word"))), F.lit(0)
            ).cast("long").alias("n_pieces"),
        )
    )
