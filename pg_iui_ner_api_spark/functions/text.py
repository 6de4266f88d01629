"""Text-analysis column functions for the training-data pipeline.

All pure Column expressions over ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen, zero Python on the hot path. Each has an exact
DuckDB-SQL twin in ``__spark_entry__.oracle_sql`` so the driver's
correctness gate covers them.

Portability contract: anything that hashes uses ``md5`` (identical
bytes in every engine) re-interpreted as an integer, never engine-
specific hash functions (Spark xxhash64 and DuckDB hash() disagree).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Ensure at least one partition per core before CPU-heavy in-row
    Column compute (shingling, hashing, per-token folds).

    A parquet file is splittable only at row-group boundaries; a
    single-row-group file scans as ONE task no matter how many cores the
    cluster has, so the expensive expressions run single-threaded (the
    driver testdata is exactly this shape). At warehouse scale inputs are
    far larger than ``maxPartitionBytes`` and this is a no-op.

    Parallelism need is estimated from the optimizer's plan statistics
    (``sizeInBytes`` / ``maxPartitionBytes``) — catalog/file-footer
    metadata only, no ``.rdd`` materialization (which would force full
    physical planning per call and, under AQE, report a pre-execution
    partition count that may not match what runs). Pass ``partitions``
    to skip the estimate entirely.
    """
    sess = df.sparkSession
    target = partitions if partitions is not None else sess.sparkContext.defaultParallelism
    if target <= 1:
        return df
    try:
        if not df.inputFiles():
            raise ValueError("not file-backed")
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        # conf may come back as "134217728", "134217728b" or "128MB"
        raw = sess.conf.get("spark.sql.files.maxPartitionBytes").lower()
        num = float(raw.rstrip("kmgtb"))
        maxpb = int(num * {"k": 2**10, "m": 2**20, "g": 2**30, "t": 2**40}.get(
            raw.rstrip("b")[-1:], 1))
        est_tasks = max(1, size // max(maxpb, 1))
    except Exception:
        # non-file plan (Range/LocalRelation/in-memory): its stats say
        # nothing about partition count; the RDD probe is cheap here —
        # no file listing is involved
        est_tasks = df.rdd.getNumPartitions()
    if est_tasks < target:
        return df.repartition(target)
    return df

# Tiny per-language marker-word lists for the n-gram/stopword language-ID
# heuristic. Deliberately small: the point is the *operator shape*
# (tokenize → explode → join marker dim → argmax per doc), which at 100 TB
# is a broadcast join + one aggregation, same as a real fastText-style LID.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "de", "et", "les"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("的", "是", "了", "我", "在"),
}


def portable_hash64(c: Column) -> Column:
    """Deterministic 60-bit integer hash of a string column.

    md5 → first 15 hex digits → base-16 parse. Bit-identical to the
    DuckDB expression ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``,
    which is what makes MinHash/SimHash oracle-checkable across engines.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def normalize_ws(c: Column) -> Column:
    """Collapse whitespace runs + trim + lowercase — dedup normalization."""
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def tokens(c: Column) -> Column:
    """Whitespace tokenization -> array<string> (empty tokens dropped)."""
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


def bpe_ish_piece_count(c: Column) -> Column:
    """Token-count proxy for a BPE tokenizer: ~4 chars per piece within
    each whitespace word, at least one piece per word. Deliberately
    lookaround-free so the same formula runs under Java regex (Spark)
    and RE2 (DuckDB oracle)."""
    return F.aggregate(
        tokens(c),
        F.lit(0),
        lambda acc, p: acc + F.greatest(F.lit(1), F.ceil(F.length(p) / 4).cast("int")),
    )


def punct_ratio(c: Column) -> Column:
    stripped = F.regexp_replace(c, r"[^\p{L}\p{N}\s]", "")
    return (F.length(c) - F.length(stripped)) / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(c: Column, stopwords: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    toks = tokens(F.lower(c))
    sw = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return sw / F.greatest(F.size(toks), F.lit(1))


def quality_score(c: Column) -> Column:
    """Composite document-quality score in [0,1]: length band + low punct
    + some stopword mass (the C4/Gopher-style heuristic family)."""
    n_tok = token_count(c)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    p = punct_ratio(c)
    punct_ok = F.when(p <= 0.2, 1.0 - p * 2).otherwise(F.lit(0.0))
    return F.round((0.5 * len_ok + 0.5 * punct_ok), 6)


def fingerprint(c: Column) -> Column:
    """Stable content fingerprint of normalized text (dedup key)."""
    return F.md5(normalize_ws(c))


def shingles(c: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles -> array<string>.

    transform over a token-index sequence: JVM higher-order functions,
    no explode until the caller wants one.
    """
    toks = tokens(normalize_ws(c))
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array(F.concat_ws(" ", toks))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(n)]
                ),
            )
        )
    )
