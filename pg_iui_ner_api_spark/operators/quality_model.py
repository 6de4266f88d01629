"""Model-based quality filtering: a hashed bag-of-words linear
classifier trained and scored entirely in DataFrame algebra.

The heuristic quality signals (functions/text.py::quality_score) catch
boilerplate; production LLM-data pipelines additionally train a LINEAR
quality model against a labeled reference corpus (CCNet's fastText LM
filter, GPT-3's quality classifier) and keep documents by model score.
This module is that component, Spark-first:

  * features — hashing trick: token -> ``portable_hash64 % buckets``
    (the md5-based portable hash, so the DuckDB oracle reproduces the
    bucketing bit-for-bit). Mean-pooled term frequencies, in-row.
  * ``score_documents`` — MAP-ONLY: the weight vector folds into the
    plan as a literal array and scoring is an in-row fold over the
    token array (element_at per token + sigmoid). Zero shuffle, zero
    Python; at 10^12 docs this is a pure projection riding the scan.
  * ``train_quality_model`` — full-batch logistic regression by
    gradient descent, each iteration ONE distributed aggregation: the
    per-doc residual (sigmoid(w·x) - y) is computed in-row with the
    current weights folded in, tokens explode to (bucket, residual/n)
    SCALARS, and the shuffle carries at most ``buckets`` partial sums
    per partition after map-side combine — the corpus text never
    shuffles, the driver sees only the gradient. Same
    collect-the-sufficient-statistics shape as ann.train_centroids
    and pq.train_pq_codebooks; train on a labeled sample at warehouse
    scale, score the full corpus map-only.

Reference parity note: the reference has no quality filtering at all;
this is beyond-reference LLM-data-pipeline surface (SURVEY.md §2,
"text analysis" family), sibling to quality_score's heuristics.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, functions as F

from ..functions.text import portable_hash64, spread, tokens


def bucket_of(tok, buckets: int):
    """Portable feature bucket of a token Column (non-negative)."""
    return F.pmod(portable_hash64(tok), F.lit(buckets)).cast("int")


def seed_weights(buckets: int, scale: float = 0.01) -> list[float]:
    """Deterministic md5-seeded weights in [-scale, scale] — the
    no-training-dependency weight vector the golden/oracle path uses."""
    return [
        (int(hashlib.md5(f"qw#{b}".encode()).hexdigest()[:15], 16)
         / float(16 ** 15) * 2.0 - 1.0) * scale
        for b in range(buckets)
    ]


def _score_expr(text_col, weights: list[float], bias: float):
    """In-row mean-pooled hashed-BoW logit: bias + Σ w[bucket(t)] / n.
    Empty and NULL documents score exactly ``bias``."""
    w_lit = F.array(*[F.lit(float(w)) for w in weights])
    toks = tokens(F.coalesce(text_col, F.lit("")))
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    s = F.aggregate(
        F.transform(toks, lambda t: F.element_at(w_lit, bucket_of(t, len(weights)) + F.lit(1))),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return F.lit(float(bias)) + s / n


def score_documents(docs: DataFrame, weights: list[float], bias: float = 0.0,
                    id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, logit, prob) — map-only quality scores under the given
    linear model. Floats rounded to 6 so results are comparable across
    engines (the DuckDB oracle mirrors the same rounded fold)."""
    logit = _score_expr(F.col(text_col), weights, bias)
    return spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.round(logit, 6).alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("prob"),
    )


def train_quality_model(labeled: DataFrame, buckets: int = 256,
                        iters: int = 20, lr: float = 2.0,
                        text_col: str = "text", label_col: str = "label",
                        ) -> tuple[list[float], float]:
    """Full-batch logistic regression on hashed-BoW features.

    ``labeled`` needs (text, label in {0,1}). Returns (weights, bias).
    Per iteration: residual r = sigmoid(w·x + b) - y computed in-row,
    then gradient partials via ONE explode + hash aggregate (≤ buckets
    rows collected). Deterministic: ordered folds, seeded init, fixed
    iteration count — a given input always yields the same model.
    """
    import numpy as np

    w = np.array(seed_weights(buckets))
    bias = 0.0
    base = spread(labeled).select(
        tokens(F.col(text_col)).alias("toks"),
        F.col(label_col).cast("double").alias("y"),
    ).where(F.size("toks") > 0)
    base = base.persist()
    try:
        n_docs = base.count()
        if n_docs == 0:
            return [float(x) for x in w], bias
        for _ in range(iters):
            logit = _score_expr_tokens(F.col("toks"), w, bias)
            resid = (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)) - F.col("y"))
            per_tok = resid / F.greatest(F.size("toks"), F.lit(1)).cast("double")
            grad_rows = (
                base.select(per_tok.alias("g"), F.explode("toks").alias("tok"))
                .select(bucket_of(F.col("tok"), buckets).alias("b"), "g")
                .groupBy("b").agg(F.sum("g").alias("gs"))
                .collect()
            )
            bias_row = base.select(F.sum(resid).alias("gb")).collect()[0]
            grad = np.zeros(buckets)
            for r in grad_rows:
                grad[r["b"]] = r["gs"]
            w = w - lr * grad / n_docs
            bias = bias - lr * float(bias_row["gb"]) / n_docs
    finally:
        base.unpersist()
    return [float(x) for x in w], float(bias)


def _score_expr_tokens(toks, weights, bias: float):
    """_score_expr over a pre-tokenized array column."""
    w_lit = F.array(*[F.lit(float(x)) for x in weights])
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    s = F.aggregate(
        F.transform(toks, lambda t: F.element_at(w_lit, bucket_of(t, len(weights)) + F.lit(1))),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return F.lit(float(bias)) + s / n
