"""Fellegi-Sunter probabilistic record-linkage scoring with EM.

Provenance: the reference deduplicates and links records by exact key
equality only (ORM lookups, /root/reference/src/utils/crud.py:62-77);
real corpus-scale entity resolution needs a PROBABILISTIC verdict on
the candidate pairs that blocking produces. This module is the classic
Fellegi-Sunter model (JASA 1969) with unsupervised EM parameter
estimation (Winkler 1988), the same shape modern ER engines (e.g.
Splink) run on Spark: the blocking stages already in this engine
(sorted-neighborhood `similarity.sorted_neighborhood_pairs`, LSH
banding, prefix filtering) generate candidate pairs; this operator
scores them.

Model: each pair has K binary agreement indicators g_k. Under
conditional independence,

    P(match | g) = lam * prod_k m_k^g (1-m_k)^(1-g)
                   -----------------------------------------------
                   lam * prod(...) + (1-lam) * prod_k u_k^g (1-u_k)^(1-g)

EM alternates the posterior above (E-step) with closed-form updates
(M-step): lam = mean(post), m_k = sum(post*g_k)/sum(post),
u_k = sum((1-post)*g_k)/sum(1-post).

100 TB shape:

  * E-step is pure in-row Column algebra against BROADCAST scalar
    params (plain Python floats folded into the plan as literals) — no
    join, no Python, map-side only.
  * M-step is ONE partial-aggregable aggregation producing 2K+2
    numbers; the per-round shuffle carries one partial-sum row per
    partition regardless of pair count, and the driver collect is the
    2K+2-value row itself (the bounded-collect contract of
    operators/linking.py).
  * Iteration count is FIXED (default 3), so the whole estimate is
    `iters` scans — no data-dependent convergence loop to stall a
    1000-executor job.
  * Determinism: every per-row expression is exactly-rounded IEEE; the
    only order-dependent step is the double-precision M-step sums,
    whose cross-engine wobble (~1e-15 relative) sits ten orders of
    magnitude below the 6-decimal rounding of the emitted scores, so
    the DuckDB twin (the same EM unrolled as chained CTEs) reproduces
    the output hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EPS = 1e-6


def _clamp(x: float) -> float:
    return min(max(x, EPS), 1.0 - EPS)


def _likelihoods(
    agree_cols: list[str], m: list[float], u: list[float], lam: float
) -> tuple[Column, Column]:
    """(lam * P(g|match), (1-lam) * P(g|non-match)) as in-row columns."""
    pm: Column = F.lit(float(lam))
    pu: Column = F.lit(1.0 - float(lam))
    for k, c in enumerate(agree_cols):
        a = F.col(c) == 1
        pm = pm * F.when(a, F.lit(float(m[k]))).otherwise(F.lit(1.0 - float(m[k])))
        pu = pu * F.when(a, F.lit(float(u[k]))).otherwise(F.lit(1.0 - float(u[k])))
    return pm, pu


def fellegi_sunter_em(
    pairs: DataFrame,
    agree_cols: list[str],
    iters: int = 3,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_lambda: float = 0.5,
) -> tuple[DataFrame, dict]:
    """Score candidate ``pairs`` (with 0/1 integer agreement columns
    ``agree_cols``) under a Fellegi-Sunter model whose parameters are
    EM-estimated from the pairs themselves.

    Returns ``(scored, params)``: ``scored`` keeps every input column
    and appends ``match_weight`` (the log2 likelihood ratio, the
    classic FS weight) and ``posterior`` (P(match | g)), both rounded
    to 6 decimals; ``params`` carries the fitted ``m``/``u``/``lam``
    plus the pair count, for lineage/metrics sinks.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not agree_cols:
        raise ValueError("agree_cols must be non-empty")
    K = len(agree_cols)
    m = [_clamp(init_m)] * K
    u = [_clamp(init_u)] * K
    lam = _clamp(init_lambda)
    n_pairs = 0
    for _ in range(iters):
        pm, pu = _likelihoods(agree_cols, m, u, lam)
        post = pm / (pm + pu)
        aggs = [F.count(F.lit(1)).alias("n"), F.sum(post).alias("sp")]
        for k, c in enumerate(agree_cols):
            aggs.append(F.sum(post * F.col(c)).alias(f"spa{k}"))
            aggs.append(F.sum((F.lit(1.0) - post) * F.col(c)).alias(f"sua{k}"))
        row = pairs.agg(*aggs).collect()[0]
        n_pairs = row["n"] or 0
        if n_pairs == 0:
            break
        sp = row["sp"]
        sn = n_pairs - sp
        lam = _clamp(sp / n_pairs)
        # a denominator collapsing to 0 means one class vanished: keep
        # the previous estimate for that side (mirrored by the oracle's
        # COALESCE(x / NULLIF(d, 0), prev))
        m = [
            _clamp(row[f"spa{k}"] / sp) if sp > 0 else m[k] for k in range(K)
        ]
        u = [
            _clamp(row[f"sua{k}"] / sn) if sn > 0 else u[k] for k in range(K)
        ]
    pm, pu = _likelihoods(agree_cols, m, u, lam)
    weight: Column = F.lit(0.0)
    for k, c in enumerate(agree_cols):
        a = F.col(c) == 1
        weight = weight + F.when(
            a, F.log2(F.lit(m[k]) / F.lit(u[k]))
        ).otherwise(F.log2(F.lit(1.0 - m[k]) / F.lit(1.0 - u[k])))
    scored = pairs.withColumn(
        "match_weight", F.round(weight, 6)
    ).withColumn("posterior", F.round(pm / (pm + pu), 6))
    return scored, {"m": m, "u": u, "lam": lam, "n_pairs": n_pairs}


def resolve_clusters(
    records: DataFrame,
    scored_pairs: DataFrame,
    a_col: str,
    b_col: str,
    id_col: str,
    min_posterior: float = 0.5,
) -> DataFrame:
    """Entity resolution, end to end: threshold FS-scored pairs at
    ``min_posterior`` and collapse the surviving match graph into
    transitive clusters (A≈B, B≈C must merge even when A,C were never a
    candidate pair). Returns one row per record:
    ``(id, cluster_id, keep)`` with cluster_id = min id of the record's
    cluster (itself when unmatched) — the same contract as
    ``dedup.fuzzy_dedup``, whose cluster machinery (pair graph orders of
    magnitude smaller than the corpus; ids-only shuffles) this reuses.
    """
    from .dedup import _cluster_keep

    pairs = scored_pairs.where(
        F.col("posterior") >= float(min_posterior)
    ).select(a_col, b_col)
    return _cluster_keep(records, pairs, a_col, b_col, id_col)
