"""Mergeable one-pass sketches: exact heavy hitters and HLL distinct.

Two classic building blocks a 100 TB corpus pipeline needs constantly
("which tokens dominate this crawl slice?", "how many distinct tokens /
users / entities per source, without shuffling the raw values?"):

* ``heavy_hitters`` — EXACT frequent items in two corpus passes, never
  shuffling the token vocabulary: pass 1 builds per-partition
  Misra–Gries summaries (Misra & Gries 1982; merge rule and the
  ``n/(k+1)`` undercount bound from Agarwal et al., "Mergeable
  Summaries", PODS 2012) whose union is a guaranteed superset of every
  item with frequency ≥ num/den; pass 2 broadcast-semi-joins that
  bounded candidate set back over the corpus and counts exactly.
  Output is the true heavy-hitter set with exact counts — deterministic
  regardless of partitioning, batch order, or the sketch's internal
  merge order, hence fully DuckDB-oracle-checkable.

* ``hll_sketch`` / ``hll_merge`` — HyperLogLog registers (Flajolet,
  Fusy, Gandouet, Meunier 2007) as per-group SPARSE (idx, rho) rows
  built by a partial-aggregable ``groupBy(group, idx).max(rho)``: the
  shuffle carries at most ``groups × 2^p`` tiny rows however large the
  corpus. Sketches are stored as sorted struct arrays and re-merged
  across arbitrary coarser groupings WITHOUT rescanning data — the
  whole point of sketch tables at warehouse scale. The raw estimate is
  hash-safe across engines: the harmonic sum is computed in exact
  64-bit integer arithmetic (``sum(2^(50-rho))`` — every term a left
  shift, total < 2^63), leaving ONE float division; the hash uses the
  same md5-prefix 60-bit integers as MinHash (``portable_hash64``), so
  registers are bit-identical in DuckDB.

Scale shape (what survives 100 TB):

* heavy-hitters pass 1 is map-only (candidates + per-partition totals
  emitted from the same pass); memory is capped at k counters per
  partition regardless of vocabulary size; pass 2's shuffle carries
  only candidate tokens' partial counts (≤ k per partition map-side).
* the HLL build's shuffle is bounded by ``groups × m`` regardless of
  input rows; merging month→year or source×lang→source sketches is a
  groupBy over sketch ROWS (thousands), not raw data (trillions).

No reference analogue: the reference service (a per-request FastAPI
NER endpoint) has no corpus-statistics surface; these extend SURVEY §2's
LLM-data-pipeline family (same motivation as dedup/dsir/token_budget).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import normalize_ws, portable_hash64, spread, tokens

# -- HLL constants -----------------------------------------------------------
# rho is derived from a 60-bit md5-prefix hash: idx = h % m uses the low
# p bits, w = h >> p the remaining (60 - p); rho = (60 - p) - bitlen(w) + 1.
# 2^(50 - rho) is then an exact bigint for every rho >= 1 produced by
# p <= 11+ (rho <= 60 - p + 1 <= 50), and a group's harmonic sum is
# <= m * 2^49 + m * 2^50 < 2^63 for p <= 12 — int64-exact, order-free.
_HASH_BITS = 60
_SHIFT_BASE = 50


def hll_alpha_m2_scaled(p: int) -> float:
    """The exact double constant alpha_m * m^2 * 2^50 (inlined verbatim
    into both the Spark plan and the DuckDB oracle so the single float
    division is the only flop and both engines divide the same
    numerator by the same integer)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(1 << _SHIFT_BASE)


def _rho(h: Column, p: int) -> Column:
    wbits = _HASH_BITS - p
    w = F.shiftrightunsigned(h, p)
    return F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    ).cast("int")


def hll_sketch(df: DataFrame, group_cols: list[str], value_col: str,
               p: int = 12) -> DataFrame:
    """(group..., regs:array<struct<idx:int,rho:int>>) — one sparse HLL
    sketch row per group over the distinct values of ``value_col``.

    Registers with rho = 0 (never hit) are omitted; ``regs`` is sorted
    by idx so sketch rows are canonical (hashable, diffable, stable
    under any partitioning)."""
    m = 1 << p
    h = portable_hash64(F.col(value_col).cast("string"))
    # NULL values carry no identity: md5(NULL) is NULL and would ride
    # through as a poisoned (NULL, NULL) register — drop them up front
    # (COUNT DISTINCT semantics ignore NULLs too)
    df = df.where(F.col(value_col).isNotNull())
    coords = df.select(
        *[F.col(c) for c in group_cols],
        F.pmod(h, F.lit(m)).cast("int").alias("idx"),
        _rho(h, p).alias("rho"),
    )
    regs = (
        coords.groupBy(*group_cols, "idx").agg(F.max("rho").alias("rho"))
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list(F.struct("idx", "rho"))).alias("regs"))
    )
    return regs


def hll_merge(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge sketch rows to a coarser grouping (register-wise max) —
    a groupBy over sketch rows only; raw data is never rescanned."""
    exploded = sketches.select(
        *[F.col(c) for c in group_cols], F.explode("regs").alias("r")
    )
    return (
        exploded.groupBy(*group_cols, F.col("r.idx").alias("idx"))
        .agg(F.max("r.rho").alias("rho"))
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list(F.struct("idx", "rho"))).alias("regs"))
    )


def hll_estimate(sketches: DataFrame, p: int = 12,
                 corrected: bool = False) -> DataFrame:
    """Append (nnz, zeros, s50, est) to sketch rows.

    ``s50 = sum_j 2^(50 - rho_j)`` over all m registers (zeros
    contribute 2^50 each) is exact int64; ``est`` is the raw HLL
    estimate ``alpha_m * m^2 * 2^50 / s50`` — ONE float division on an
    engine-independent integer, rounded to 4 dp, so it hash-matches the
    DuckDB twin bit-for-bit. With ``corrected=True`` the standard
    small-range linear-counting branch (E <= 2.5m and zeros > 0 ->
    m * ln(m / zeros)) replaces the raw estimate; ln() is libm-
    dependent, so the corrected form is pytest-verified against exact
    counts rather than oracle-hashed."""
    m = 1 << p
    c = hll_alpha_m2_scaled(p)
    nnz = F.size("regs")
    zeros = (F.lit(m) - nnz).cast("long")
    # F.shiftleft requires a literal bit count; express the per-register
    # term with expr so the shift amount can be the rho column.
    s_set = F.expr(
        "aggregate(regs, CAST(0 AS BIGINT), "
        "(acc, r) -> acc + shiftleft(CAST(1 AS BIGINT), 50 - r.rho))"
    )
    s50 = (s_set + zeros * F.lit(1 << _SHIFT_BASE).cast("long")).alias("s50")
    raw = F.round(F.lit(c) / s50.cast("double"), 4)
    if corrected:
        lc = F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")), 4)
        est = F.when((F.lit(c) / s50.cast("double") <= F.lit(2.5 * m)) & (zeros > 0), lc).otherwise(raw)
    else:
        est = raw
    return sketches.select(
        *[cn for cn in sketches.columns if cn != "regs"],
        nnz.cast("long").alias("nnz"),
        zeros.alias("zeros"),
        s50,
        est.alias("est"),
    )


def hll_union_col(ra: Column, rb: Column) -> Column:
    """In-row union of two sparse register arrays (register-wise max) —
    lets set algebra over stored sketch tables run as plain column
    expressions after a join, with no re-scan of raw data."""
    ma = F.map_from_entries(ra)
    mb = F.map_from_entries(rb)
    merged = F.map_zip_with(
        ma, mb, lambda _, x, y: F.greatest(F.coalesce(x, F.lit(0)),
                                           F.coalesce(y, F.lit(0)))
    )
    return F.array_sort(
        F.transform(
            F.map_entries(merged),
            lambda e: F.struct(e["key"].alias("idx"), e["value"].alias("rho")),
        )
    )


def hll_intersect_estimate(joined: DataFrame, ra: str, rb: str,
                           p: int = 12) -> DataFrame:
    """Append ``est_a``, ``est_b``, ``est_union``, ``est_intersect`` to
    a DataFrame holding two sketch columns per row (e.g. the join of
    two stored sketch tables): inclusion–exclusion over corrected HLL
    estimates, all in-row — distinct-overlap questions ("how many
    tokens do these two sources share?") answered from sketch tables
    alone. Relative error grows as the true intersection shrinks
    (inclusion–exclusion subtracts two large estimates), which is the
    documented property of HLL set algebra; the pytest suite pins the
    sizable-overlap regime."""
    m = 1 << p
    c = hll_alpha_m2_scaled(p)

    def est_expr(col_name: str) -> Column:
        # corrected estimate (raw HLL + linear-counting small-range
        # branch) of one sparse register column, fully in-row; the
        # shift amount is the rho field, so the fold uses expr form
        # (F.shiftleft takes only a literal bit count)
        zeros = (F.lit(m) - F.size(F.col(col_name))).cast("long")
        s_set = F.expr(
            f"aggregate({col_name}, CAST(0 AS BIGINT), "
            "(acc, r) -> acc + shiftleft(CAST(1 AS BIGINT), 50 - r.rho))"
        )
        s50 = (s_set + zeros * F.lit(1 << _SHIFT_BASE).cast("long")).cast("double")
        raw = F.lit(c) / s50
        lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
        return F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), lc).otherwise(raw)

    out = joined.withColumn("_u", hll_union_col(F.col(ra), F.col(rb)))
    ea, eb, eu = est_expr(ra), est_expr(rb), est_expr("_u")
    return (
        out.withColumn("est_a", F.round(ea, 4))
        .withColumn("est_b", F.round(eb, 4))
        .withColumn("est_union", F.round(eu, 4))
        .withColumn(
            "est_intersect",
            F.round(F.greatest(ea + eb - eu, F.lit(0.0)), 4),
        )
        .drop("_u")
    )


# -- exact heavy hitters -----------------------------------------------------

def heavy_hitters(docs: DataFrame, num: int = 1, den: int = 1000,
                  text_col: str = "text") -> DataFrame:
    """(tok, cnt) — EXACTLY the tokens whose corpus-wide occurrence
    count satisfies ``cnt * den >= total_tokens * num`` (i.e. frequency
    >= num/den, compared in exact integer arithmetic).

    Two passes, no vocabulary shuffle:

    1. candidate pass (map-only): per-partition Misra–Gries summaries
       with k = ceil(den/num) + 1 counters. Within a partition, batch
       counts merge by add-then-decrement (subtract the (k+1)-th
       largest, drop non-positives) — the PODS'12 mergeable-summaries
       rule, so any token with partition count > n_p/(k+1) survives its
       partition, and weighted pigeonhole makes the union a superset of
       every token with global frequency >= num/den. The same pass
       emits one (NULL, n_p) row per partition so the corpus total
       needs no extra scan.
    2. verify pass: broadcast the candidate set (<= k x partitions
       rows) into a semi-join over the token stream and count exactly;
       the shuffle carries <= k partial counts per partition.

    The output depends only on the exact counts, never on the sketch's
    internal state, so it is deterministic under any partitioning and
    fully oracle-checkable."""
    if num <= 0 or den <= 0:
        raise ValueError("num/den must be a positive rational frequency")
    k = den // num + 2  # > den/num, strict superset guarantee

    tok_stream = spread(docs).select(
        F.explode(tokens(normalize_ws(F.col(text_col)))).alias("tok")
    )
    # the sketch pass reads token ARRAYS (one Arrow row per doc, not
    # per token) — two orders of magnitude fewer rows through the
    # Python boundary; the flatten + value_counts are C-speed
    doc_toks = spread(docs).select(
        tokens(normalize_ws(F.col(text_col))).alias("toks")
    )

    def mg_partition(batches):
        import numpy as np
        import pandas as pd

        state = None
        n_seen = 0
        for pdf in batches:
            # a NULL text arrives as None (tokens(NULL) is NULL, and
            # Arrow ships it as a null list) — skip, like explode does
            lists = [x for x in pdf["toks"] if x is not None and len(x)]
            if not lists:
                continue
            flat = np.concatenate([np.asarray(x, dtype=object) for x in lists])
            n_seen += len(flat)
            vc = pd.Series(flat).value_counts()
            state = vc if state is None else state.add(vc, fill_value=0)
            if len(state) > k:
                arr = state.to_numpy()
                d = np.partition(arr, len(arr) - (k + 1))[len(arr) - (k + 1)]
                state = state[state > d] - d
        toks = [] if state is None else list(state.index)
        yield pd.DataFrame({
            "tok": toks + [None],
            "part_n": [None] * len(toks) + [n_seen],
        })

    summary = doc_toks.mapInPandas(
        mg_partition, "tok string, part_n long"
    ).localCheckpoint(eager=False)
    cands = summary.where(F.col("tok").isNotNull()).select("tok").distinct()
    total = summary.where(F.col("tok").isNull()).agg(
        F.sum("part_n").alias("total")
    )
    verified = (
        tok_stream.join(F.broadcast(cands), "tok")
        .groupBy("tok").agg(F.count("*").alias("cnt"))
    )
    return (
        verified.join(F.broadcast(total))
        .where(F.col("cnt") * F.lit(den) >= F.col("total") * F.lit(num))
        .select("tok", "cnt")
    )
