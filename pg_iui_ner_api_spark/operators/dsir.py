"""Data Selection via Importance Resampling (DSIR) for corpus curation.

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling") select raw web documents whose hashed-n-gram feature
distribution looks like a trusted target corpus: estimate bucketed
n-gram distributions p_target / p_raw, weight every raw doc by its
log importance ratio sum, then sample without replacement with
probability proportional to the weights — implemented exactly as the
paper does, via the Gumbel-top-k trick. This module is that pipeline as
pure DataFrame algebra with one twist for engine-grade reproducibility:
the Gumbel noise is a deterministic function of (seed, doc_id)
(md5-derived uniform -> -ln(-ln(u))), so the selected set is a pure
function of its inputs — stable across reruns, partitionings, and
engines, and therefore exactly DuckDB-oracle-checkable.

Scale shape (what survives 100 TB):

* features are the md5-hashed bigrams of ``operators/lm.py`` folded
  into ``buckets`` (default 4096) IN-ROW — shuffles carry (doc_id,
  4-byte bucket), never token text;
* both distribution estimates are partial-aggregable groupBys over the
  bucket id: a stop-word bucket occurring 10^10 times collapses
  map-side;
* the per-bucket log-ratio table has at most ``buckets`` rows — it is
  broadcast into the scoring join, so scoring is map-side after the
  one groupBy(doc_id) shuffle;
* the raw-corpus feature table has two consumers (raw counts + the
  scoring join) and is localCheckpoint'd once;
* selection is a TakeOrdered top-k (per-partition k then driver merge),
  never a global sort.

Docs with fewer than two tokens have no features and are never
selected — count them upstream with ``token_stats`` (same contract as
``lm_score``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import portable_hash64
from .lm import doc_bigrams

TWO_60 = float(1 << 60)  # md5-prefix ints are uniform on [0, 2^60)


def _feature_buckets(docs: DataFrame, buckets: int, id_col: str,
                     text_col: str) -> DataFrame:
    """(doc_id, bkt) — one row per bigram occurrence, bucket-folded."""
    return doc_bigrams(docs, id_col, text_col).select(
        "doc_id", F.pmod(F.col("h12"), F.lit(buckets)).cast("int").alias("bkt")
    )


def dsir_weights(raw_docs: DataFrame, target_docs: DataFrame,
                 buckets: int = 4096, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, n_feats, logratio) for every raw doc with >= 1 feature.

    logratio = sum over the doc's bigram occurrences of
    ln p_target(bkt) - ln p_raw(bkt), with add-one smoothing on both
    estimates: p(bkt) = (c(bkt) + 1) / (N + buckets).
    """
    rb = _feature_buckets(raw_docs, buckets, id_col, text_col)
    rb = rb.localCheckpoint()  # two consumers: raw counts + scoring join
    tb = _feature_buckets(target_docs, buckets, id_col, text_col)
    rc = rb.groupBy("bkt").agg(F.count(F.lit(1)).alias("cr"))
    tc = tb.groupBy("bkt").agg(F.count(F.lit(1)).alias("ct"))
    nr = rc.agg(F.coalesce(F.sum("cr"), F.lit(0)).alias("nr"))
    nt = tc.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"))
    # <= buckets rows; raw buckets always hit rc (a raw doc's own
    # occurrences are counted), target side left-joined + 0-filled
    lr = (
        rc.join(tc, "bkt", "left")
        .join(F.broadcast(nr))
        .join(F.broadcast(nt))
        .select(
            "bkt",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
                    / (F.col("nt") + float(buckets))
                )
                - F.log((F.col("cr") + 1.0) / (F.col("nr") + float(buckets)))
            ).alias("lr"),
        )
    )
    return (
        rb.join(F.broadcast(lr), "bkt")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("lr").alias("logratio"),
        )
    )


def gumbel_key(id_col, seed: str):
    """Deterministic standard-Gumbel draw from md5(seed|id): fold the
    digest's first 60 bits to u in (0, 1), then -ln(-ln(u)). Strictly
    inside (0, 1): u = (k + 1) / (2^60 + 1) with k in [0, 2^60)."""
    k = portable_hash64(
        F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))
    )
    u = (k + F.lit(1.0)) / F.lit(TWO_60 + 1.0)
    return -F.log(-F.log(u))


def dsir_select(raw_docs: DataFrame, target_docs: DataFrame, k: int = 50,
                seed: str = "s0", buckets: int = 4096,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-k Gumbel importance resample of the raw corpus toward the
    target distribution: (doc_id, n_feats, logratio, sel_score), the k
    rows maximizing logratio + Gumbel(seed, doc_id), ties broken by
    doc_id. Floats are rounded to 4 decimals AFTER selection."""
    w = dsir_weights(raw_docs, target_docs, buckets, id_col, text_col)
    scored = w.withColumn("sel_score", F.col("logratio") + gumbel_key("doc_id", seed))
    return (
        scored.orderBy(F.col("sel_score").desc(), "doc_id")
        .limit(k)
        .select(
            "doc_id",
            "n_feats",
            F.round("logratio", 4).alias("logratio"),
            F.round("sel_score", 4).alias("sel_score"),
        )
    )
