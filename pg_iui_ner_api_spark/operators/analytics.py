"""Relational analytics operators Spark lacks as single primitives:
as-of join, interval range join, per-key timeline features, exact
grouped quantiles, rollup and pivot summaries.

Provenance: the reference exposes its data through per-request REST
lookups (/root/reference/src/routers/main_endpoints.py) and leaves
time-relational analytics to the caller; a batch engine over the same
corpus needs them as first-class, shuffle-aware operators. Each one is
expressible in ANSI SQL, so the driver's DuckDB oracle checks it
end-to-end.

Scale notes (100 TB):
- ``asof_join`` is the union-of-streams trick: ONE shuffle on the join
  keys, two window sorts, no join explosion — the classic distributed
  replacement for a per-key merge_asof. An equi-join + filter + argmax
  formulation would shuffle |L|x|R per key| intermediate rows; this
  shuffles |L|+|R|.
- ``range_join`` expands intervals to coarse time buckets and
  equi-joins on (key, bucket): the shuffle key is hash(key, bucket), so
  long timelines spread across partitions instead of hot-keying, and
  the residual containment filter runs map-side after the join. Bucket
  width trades replication (interval rows duplicated per covered
  bucket) against join selectivity; pick it near the p95 interval
  length.
- ``timeline_features`` / ``grouped_quantiles`` / ``rollup_summary`` /
  ``pivot_counts`` are single-shuffle window/agg plans that Catalyst
  keeps entirely in whole-stage codegen; ``pivot_counts`` requires an
  explicit value list so the plan is a one-pass pivot aggregation
  (no distinct-values pre-scan, which at 100 TB would be a second
  full read).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _epoch(ts: Column) -> Column:
    # TIMESTAMP_NTZ-safe epoch seconds (Spark 4 rejects NTZ -> BIGINT
    # directly; NTZ -> TIMESTAMP -> BIGINT is legal).
    return ts.cast("timestamp").cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    tiebreak: str | None = None,
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """LEFT as-of join: each left row gets the nearest right row at or
    before (``backward``) / at or after (``forward``) its timestamp,
    within the same ``keys``; unmatched left rows keep NULLs.

    Tie rules (pinned by tests and the DuckDB oracle): a right row at
    exactly the left timestamp matches (inclusive); among right rows
    with equal timestamp the one with the greatest ``tiebreak`` wins
    for ``backward`` (it is the latest in stream order), the smallest
    for ``forward``.

    Matched right columns come back as ``<col>_r`` plus
    ``matched_ts`` (epoch seconds) and ``gap_seconds``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = list(keys)
    right_cols = [c for c in right_cols if c not in keys]

    payload = F.struct(
        _epoch(F.col(right_ts)).alias("_rts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    # A right row with a NULL timestamp can never legitimately match;
    # left in the stream its NULL _pos would sort nulls-first and become
    # a spurious head-of-partition match for left rows with no real
    # predecessor. Drop before building the union stream.
    right = right.where(F.col(right_ts).isNotNull())
    r = right.select(
        *keys,
        _epoch(F.col(right_ts)).alias("_pos"),
        F.lit(0).alias("_is_left"),
        payload.alias("_match"),
        tb.alias("_tb"),
    )
    l = left.withColumn("_pos", _epoch(F.col(left_ts))).withColumn(
        "_is_left", F.lit(1)
    ).withColumn("_match", F.lit(None).cast(r.schema["_match"].dataType)).withColumn(
        "_tb", F.lit(None).cast(r.schema["_tb"].dataType)
    )
    ev = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        # right rows sort before left at the same ts (inclusive match);
        # among equal-ts right rows the max tiebreak sorts LAST so
        # last(ignorenulls) picks it.
        order = [
            F.col("_pos").asc(),
            F.col("_is_left").asc(),
            F.col("_tb").asc_nulls_first(),
        ]
    else:
        # descending stream: right rows at the same ts still sort before
        # left; among equal-ts right rows the MIN tiebreak sorts last.
        order = [
            F.col("_pos").desc(),
            F.col("_is_left").asc(),
            F.col("_tb").desc_nulls_first(),
        ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = ev.withColumn("_m", F.last("_match", ignorenulls=True).over(w)).where(
        F.col("_is_left") == 1
    )
    gap = (
        (F.col("_pos") - F.col("_m._rts"))
        if direction == "backward"
        else (F.col("_m._rts") - F.col("_pos"))
    )
    if tolerance_seconds is not None:
        out = out.withColumn(
            "_m", F.when(gap <= tolerance_seconds, F.col("_m"))
        )
    out = out.select(
        *[c for c in left.columns],
        F.col("_m._rts").alias("matched_ts"),
        *[F.col(f"_m.{c}").alias(f"{c}_r") for c in right_cols],
    )
    m_ts = F.col("matched_ts")
    gap_out = (
        (_epoch(F.col(left_ts)) - m_ts)
        if direction == "backward"
        else (m_ts - _epoch(F.col(left_ts)))
    )
    return out.withColumn("gap_seconds", gap_out)


def range_join(
    intervals: DataFrame,
    points: DataFrame,
    keys: Sequence[str],
    start_col: str = "s_start",
    end_col: str = "s_end",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Interval-containment join: point row p matches interval row i of
    the same ``keys`` when ``i.start <= p.ts <= i.end`` (inclusive both
    ends; ``start_col``/``end_col`` are epoch seconds, ``ts_col`` a
    timestamp).

    Physical plan: intervals explode to the coarse time buckets they
    cover (``sequence`` — in-row, no shuffle), points map to their one
    bucket, then a single equi-join on (keys, bucket) + residual
    containment filter. Each (interval, point) pair can only meet in
    the point's single bucket, so no post-join distinct is needed.
    """
    keys = list(keys)
    b = int(bucket_seconds)
    # Fan-out guards (mirrors _deletion_variants' explicit max_len cap):
    # an inverted interval (end < start — Spark's sequence would silently
    # count DOWN and still emit buckets) is corrupt and matches nothing,
    # so it is filtered; a runaway interval (far-future end) fails fast
    # with a clear error instead of exploding to millions of rows.
    lo = (F.col(start_col) / b).cast("long")
    hi = (F.col(end_col) / b).cast("long")
    guard = F.assert_true(
        hi - lo < F.lit(int(max_buckets_per_interval)),
        F.concat(
            F.lit("range_join: interval spans too many buckets "
                  f"(cap {max_buckets_per_interval}): "),
            F.col(start_col).cast("string"), F.lit(".."),
            F.col(end_col).cast("string"),
        ),
    )
    # assert_true is NULL on pass, so this `when` is the identity on lo —
    # but it keeps the guard inside the live expression tree (a separate
    # dropped column would be pruned by Catalyst and never evaluated).
    lo_checked = F.when(guard.isNull(), lo)
    iv = intervals.where(F.col(end_col) >= F.col(start_col)).withColumn(
        "_bkt", F.explode(F.sequence(lo_checked, hi))
    )
    pt = points.withColumn("_bkt", (_epoch(F.col(ts_col)) / b).cast("long"))
    cond = [pt["_bkt"] == iv["_bkt"]] + [pt[k] == iv[k] for k in keys]
    joined = pt.join(iv, cond, "inner").where(
        (_epoch(pt[ts_col]) >= iv[start_col]) & (_epoch(pt[ts_col]) <= iv[end_col])
    )
    return joined.select(
        *[pt[c] for c in points.columns],
        *[iv[c] for c in intervals.columns if c not in keys],
    )


def timeline_features(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    ma_window: int = 3,
) -> DataFrame:
    """Per-key event-time features: previous value (lag), running sum,
    trailing ``ma_window``-row moving average, and ordinal — one window
    shuffle, fully codegen'd. The summation order is pinned by the
    window sort, so the running sum is bit-reproducible across engines.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    )
    wma = w.rowsBetween(-(ma_window - 1), Window.currentRow)
    v = F.col(value_col)
    return events.select(
        key_col,
        order_tiebreak,
        F.round(v, 6).alias("value"),
        F.row_number().over(w).alias("seq"),
        F.round(F.lag(v).over(w), 6).alias("prev_value"),
        F.round(F.sum(v).over(w.rowsBetween(Window.unboundedPreceding, 0)), 6).alias(
            "run_sum"
        ),
        F.round(F.avg(v).over(wma), 6).alias("ma"),
    )


def grouped_quantiles(
    df: DataFrame,
    value_col: str,
    by: Sequence[str],
    qs: Sequence[float] = (0.25, 0.5, 0.75),
    approx: bool = False,
) -> DataFrame:
    """Exact (or approximate) grouped quantiles with linear
    interpolation — `percentile` matches DuckDB's ``quantile_cont``.

    ``approx=True`` switches to ``approx_percentile`` (t-digest-style
    single-pass sketch): the 100 TB path, where an exact percentile
    would buffer every group value. The exact variant is the oracle
    surface; the approx variant's error is bounded by the accuracy knob
    and pytest-checked against the exact one.
    """
    def _label(q: float) -> str:
        # precision-preserving: 0.25 -> q25, 0.999 -> q99_9 (truncating
        # to int would collide p99 with p99.9)
        pct = q * 100
        return f"q{int(pct):02d}" if pct == int(pct) else \
            f"q{str(pct).replace('.', '_')}"

    labels = [_label(float(q)) for q in qs]
    if len(set(labels)) != len(labels):
        raise ValueError(f"quantile labels collide: {labels}")
    fn = "approx_percentile" if approx else "percentile"
    arr = "array(" + ", ".join(repr(float(q)) for q in qs) + ")"
    agg = F.expr(f"{fn}(`{value_col}`, {arr})")  # backticked identifier
    cols = [F.round(agg[i], 6).alias(lb) for i, lb in enumerate(labels)]
    return df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"), *cols
    )


def resample_ffill(
    events: DataFrame,
    interval_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Per-key downsample to fixed ``interval_seconds`` bins with
    forward fill: each bin carries the LAST observed value in the bin
    (ties on the timestamp break by greatest ``tiebreak``), and bins
    with no observation between a key's first and last active bin
    inherit the previous bin's value — the gap-free regular timeline
    every time-series feature join wants.

    Plan: one groupBy to (key, bin, last value), a per-key span
    aggregate whose ``sequence`` explode generates the dense grid
    IN-ROW (no driver-side calendar table), a co-keyed left join, and
    one window for the fill — shuffles carry (key, bin, value) only.
    """
    b = int(interval_seconds)
    sec = _epoch(F.col(ts_col))
    binned = (
        events.groupBy(
            F.col(key_col).alias("key"),
            F.floor(sec / b).alias("bin"),
        )
        .agg(
            F.max_by(
                F.col(value_col), F.struct(sec, F.col(tiebreak))
            ).alias("_v")
        )
    )
    grid = (
        binned.groupBy("key")
        .agg(F.min("bin").alias("b0"), F.max("bin").alias("b1"))
        .select("key", F.explode(F.sequence("b0", "b1")).alias("bin"))
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(binned, ["key", "bin"], "left")
        .select(
            "key",
            "bin",
            F.last("_v", ignorenulls=True).over(w).alias(value_col),
            F.col("_v").isNull().alias("filled"),
        )
    )


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel completion per user: step i+1 counts only when it
    occurs AT OR AFTER the earliest completion of step i (inclusive —
    same-second events satisfy the order; positions are epoch seconds).

    Returns ``(user, stages, t_final)``: number of consecutive leading
    steps completed (0..len(steps)) and the completion time of the LAST
    step for fully-converted users (null otherwise). Every user present
    in ``events`` gets a row.

    One shuffle: events group to a per-user sorted (t, type) array and
    the step chain evaluates as nested in-row array algebra — no
    per-step joins (the k-CTE SQL formulation the DuckDB oracle uses
    would be k shuffled joins at 100 TB; here step k's filter is a
    HOF over the already-grouped array).
    """
    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        F.col(user_col).alias("user"),
        F.struct(
            _epoch(F.col(ts_col)).alias("t"), F.col(type_col).alias("et")
        ).alias("e"),
    )
    g = ev.groupBy("user").agg(F.sort_array(F.collect_list("e")).alias("seq"))

    def step_min(step: str, prev: Column | None) -> Column:
        cond = (lambda e: (e["et"] == step) & (e["t"] >= prev)) if prev is not None \
            else (lambda e: e["et"] == step)
        return F.array_min(F.transform(F.filter("seq", cond), lambda e: e["t"]))

    ts_cols: list[Column] = []
    prev = None
    for s in steps:
        prev = step_min(s, prev)
        ts_cols.append(prev)
    g = g.select(
        "user", *[c.alias(f"_t{i}") for i, c in enumerate(ts_cols)]
    )
    stages = sum(
        F.col(f"_t{i}").isNotNull().cast("int") for i in range(len(steps))
    )
    return g.select(
        "user",
        stages.alias("stages"),
        F.col(f"_t{len(steps) - 1}").alias("t_final"),
    )


def histogram(
    df: DataFrame,
    value_col: str,
    by: Sequence[str],
    bins: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """Fixed-width histogram per group over ``[lo, hi)``; out-of-range
    values clamp into the edge bins. One partial-aggregated shuffle of
    (group, bin) — the distribution profile at any scale."""
    if bins < 1 or not hi > lo:
        raise ValueError(f"need bins >= 1 and hi > lo, got bins={bins} [{lo}, {hi})")
    w = (hi - lo) / bins
    b = F.least(
        F.greatest(F.floor((F.col(value_col) - lo) / w), F.lit(0)),
        F.lit(bins - 1),
    ).cast("int")
    keep = F.col(value_col).isNotNull()
    if df.schema[value_col].dataType.typeName() in ("double", "float"):
        # NaN sorts greater than everything in Spark, so without this it
        # would silently clamp into the TOP bin instead of being excluded
        keep = keep & ~F.isnan(F.col(value_col))
    return (
        df.where(keep)
        .groupBy(*by, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cube_summary(
    df: DataFrame, dims: Sequence[str], value_col: str
) -> DataFrame:
    """CUBE over ``dims``: subtotals at every dim subset (NULL = rolled
    up), one shuffle with partial aggregation — same contract as
    ``rollup_summary`` but all 2^d groupings.

    ``lvl`` counts rolled-up dims via ``grouping()`` (not ``isNull``),
    so a genuine NULL data value at the finest grain stays lvl=0 and is
    never conflated with the subtotal row that shares its dim values.
    """
    return df.cube(*dims).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(value_col), 2).alias("total"),
        sum(F.grouping(d).cast("int") for d in dims).alias("lvl"),
    )


def rollup_summary(
    df: DataFrame, dims: Sequence[str], value_col: str
) -> DataFrame:
    """ROLLUP over ``dims``: subtotal rows at every prefix level plus the
    grand total (NULL dim = subtotal), one shuffle with partial
    aggregation — the hypertable-rollup shape for hierarchical reports.

    ``lvl`` uses ``grouping()`` like ``cube_summary`` so data NULLs are
    not miscounted as subtotal levels.
    """
    return df.rollup(*dims).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(value_col), 2).alias("total"),
        sum(F.grouping(d).cast("int") for d in dims).alias("lvl"),
    )


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    approx: bool = True,
) -> DataFrame:
    """Per-column data-quality profile in ONE pass: row count, non-null
    count, distinct count, min and max (as strings) — the ingest-QA op
    a pipeline runs before trusting a new corpus drop.

    All stats aggregate into a single row, then unpivot to long format
    (``column, n_rows, n_nonnull, n_distinct, min_val, max_val``) with
    an in-row stack over that one row — one scan, one (single-row)
    aggregation, no per-column jobs.

    ``approx=True`` (default — the 100 TB path) uses
    ``approx_count_distinct`` (HyperLogLog++, one pass, mergeable
    partials); ``approx=False`` is the exact oracle surface — Spark
    plans multi-column exact distincts via Expand (rows × columns
    blow-up before the shuffle), which is exactly why the sketch is the
    default at scale.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    nd = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            nd(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    stacked = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col("_n").alias("n_rows"),
                    F.col(f"_nn_{c}").alias("n_nonnull"),
                    F.col(f"_nd_{c}").alias("n_distinct"),
                    F.col(f"_min_{c}").alias("min_val"),
                    F.col(f"_max_{c}").alias("max_val"),
                )
                for c in cols
            ]
        )
    )
    return one.select(stacked.alias("p")).select("p.*")


def topk_per_group(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    k: int,
    tiebreak: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """Top-``k`` rows per group by ``order_col`` (``tiebreak`` pins a
    total order so results are deterministic across engines).

    One window shuffle on the group keys; the rank filter runs streaming
    inside the window sort, so only k rows per group survive the
    operator — Spark 3.5+ additionally pushes a per-partition
    WindowGroupLimit BELOW the shuffle (top-k rows per group per map
    task cross the wire, not whole groups).
    """
    if "rank" in df.columns:
        # withColumn would silently overwrite a pre-existing data column
        raise ValueError(
            "input already has a 'rank' column; rename it before "
            "topk_per_group (the operator emits its own 'rank')"
        )
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    order = [oc] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*[F.col(c) for c in part_cols]).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def pivot_counts(
    df: DataFrame,
    row_key: str,
    pivot_col: str,
    values: Sequence[str],
) -> DataFrame:
    """Counts of ``pivot_col`` values as columns per ``row_key``.

    ``values`` is REQUIRED: with an explicit list the plan is one pivot
    aggregation; without it Spark first runs a distinct scan over
    ``pivot_col`` — a second full pass at 100 TB.
    """
    return (
        df.groupBy(row_key)
        .pivot(pivot_col, list(values))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(values))
    )


def key_skew(df: DataFrame, key: str, top_n: int = 20) -> DataFrame:
    """Heavy-hitter profile of a join/aggregation key:
    ``(key, cnt, share, rank)`` for the ``top_n`` heaviest values.

    The pre-flight diagnostic every 100 TB shuffle wants: if the top
    key's ``share`` is a few percent, that key's partition IS the
    straggler, and the caller should salt it (or cap it — the
    co-occurrence/adamic-adar hub contract) before joining.

    Shape: one partial-aggregable count per key, then TakeOrdered
    (map-side top-N, never a global sort); the rank window runs over
    the N surviving rows only — bounded by construction, same class as
    dictionary encoding's B-row offsets table. ``share`` divides two
    exact ints in one IEEE op (total is a bounded driver scalar).
    """
    # one corpus scan: counts are checkpointed so the total and the
    # top-N both read the narrow per-key table, never the corpus twice
    counts = (
        df.groupBy(F.col(key).alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    total = counts.agg(F.sum("cnt")).collect()[0][0]
    top = counts.orderBy(F.col("cnt").desc(), F.col("key")).limit(top_n)
    w = Window.orderBy(F.col("cnt").desc(), F.col("key"))
    return top.select(
        "key",
        "cnt",
        (F.col("cnt") / F.lit(total)).alias("share"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


def scd2_build(
    df: DataFrame,
    key: str,
    ts: str,
    attrs: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Change log -> type-2 slowly-changing dimension: one row per
    (key, attribute-state) EPISODE with ``valid_from``/``valid_to``
    (NULL valid_to = current). The standard warehouse construction for
    "what did this entity look like at time T" — for the KG, entity
    attributes versioned by extraction time.

    Two windowed passes over ONE hash partitioning on the key (no
    join): a lag-compare drops consecutive no-op changes (same attrs as
    the previous event), then lead() closes each surviving episode at
    the next survivor's timestamp. ``tiebreak`` orders same-timestamp
    events deterministically (defaults to the first attr).
    """
    order = [F.col(ts).asc(), F.col(tiebreak or attrs[0]).asc()]
    w = Window.partitionBy(key).orderBy(*order)
    state = F.struct(*[F.col(a) for a in attrs])
    # null-safe compare: a plain != returns NULL (and drops the row)
    # whenever any attr is NULL on either side; <=> keeps those episodes
    changed = df.select(key, ts, *attrs).withColumn(
        "_prev", F.lag(state).over(w)
    ).where(~state.eqNullSafe(F.col("_prev")))
    w2 = Window.partitionBy(key).orderBy(*order)
    return changed.select(
        key,
        *attrs,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w2).alias("valid_to"),
    )


def interval_coverage(
    df: DataFrame,
    start: str,
    end: str,
    partitions: int = 64,
) -> DataFrame:
    """Sweep-line interval coverage: for every boundary timestamp,
    how many half-open intervals ``[start, end)`` are active —
    ``(ts, n_active)``, one row per distinct boundary. Concurrency
    counting (active sessions over time, overlapping extraction spans)
    as one pass, no self-join.

    The core is a GLOBAL running sum of +1/-1 deltas — the textbook
    single-partition-window scale killer — computed distributed:
    range-partition the (deduped) boundary deltas, running-sum WITHIN
    each partition, then add the exclusive prefix of per-partition
    totals (a ``partitions``-row bounded table, broadcast back) — the
    same B-row offset construction as ``encoding.dictionary_encode``.
    The result is partition-count independent: range partitioning only
    decides where each row's prefix is split, never its value.
    """
    events = df.select(F.col(start).alias("ts"), F.lit(1).alias("d")).unionAll(
        df.select(F.col(end).alias("ts"), F.lit(-1).alias("d"))
    )
    deltas = (
        events.groupBy("ts")
        .agg(F.sum("d").cast("long").alias("delta"))
        .repartitionByRange(partitions, "ts")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()  # pin pid; consumed by both the run and the offsets
    )
    w_in = Window.partitionBy("pid").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = deltas.withColumn("run", F.sum("delta").over(w_in))
    totals = deltas.groupBy("pid").agg(F.sum("delta").alias("tot"))
    w_off = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.select(
        "pid", (F.sum("tot").over(w_off) - F.col("tot")).alias("off")
    )
    return run.join(F.broadcast(offsets), "pid").select(
        "ts", (F.col("run") + F.col("off")).cast("long").alias("n_active")
    )


def interpolate_linear(
    events: DataFrame,
    interval_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Per-key downsample to fixed bins with LINEAR interpolation of
    interior gaps — the companion to ``resample_ffill`` for series
    where a staircase fill distorts (sensor readings, rates):

        v(bin) = v_prev + (v_next - v_prev) * (bin - t_prev)
                                              / (t_next - t_prev)

    Bins before a key's first observation or after its last stay the
    observed NULL-free span by construction (the grid spans min..max
    observed bin), so every emitted bin either carries an observation
    or sits strictly between two and interpolates; ``interpolated``
    flags the synthesized rows.

    Plan: identical shape to ``resample_ffill`` — one groupBy to the
    per-bin last value, an in-row ``sequence`` explode for the dense
    grid, one co-keyed left join, then ONE window pass computing the
    four IGNORE NULLS neighbor columns (prev/next value and bin) that
    feed the in-row interpolation formula. Shuffles carry
    (key, bin, value) only.
    """
    b = int(interval_seconds)
    sec = _epoch(F.col(ts_col))
    binned = events.groupBy(
        F.col(key_col).alias("key"), F.floor(sec / b).alias("bin")
    ).agg(
        F.max_by(F.col(value_col), F.struct(sec, F.col(tiebreak))).alias("_v")
    )
    grid = (
        binned.groupBy("key")
        .agg(F.min("bin").alias("b0"), F.max("bin").alias("b1"))
        .select("key", F.explode(F.sequence("b0", "b1")).alias("bin"))
    )
    wp = Window.partitionBy("key").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy("key").orderBy("bin").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    v = F.col("_v").cast("double")
    obs_bin = F.when(F.col("_v").isNotNull(), F.col("bin"))
    pv = F.last(v, ignorenulls=True).over(wp)
    pt = F.last(obs_bin, ignorenulls=True).over(wp)
    nv = F.first(v, ignorenulls=True).over(wn)
    nt = F.first(obs_bin, ignorenulls=True).over(wn)
    interp = pv + (nv - pv) * (F.col("bin") - pt) / (nt - pt)
    return grid.join(binned, ["key", "bin"], "left").select(
        "key",
        "bin",
        F.round(F.when(v.isNotNull(), v).otherwise(interp), 6).alias(value_col),
        F.col("_v").isNull().alias("interpolated"),
    )


def rolling_range_stats(
    events: DataFrame,
    window_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Trailing TIME-window statistics per event — count/mean/stddev of
    the values in the preceding ``window_seconds`` (current second's
    peers EXCLUDED via the ``RANGE ... AND 1 PRECEDING`` frame, so an
    event never smooths itself into its own baseline) plus the z-score
    of the current value against that trailing baseline — the streaming
    anomaly-detection primitive, computed batch-side.

    One window shuffle on the key; RANGE frames over the integer epoch
    second keep the whole computation inside whole-stage codegen
    (row-based frames can't express "last hour" when event spacing is
    irregular).
    """
    w = int(window_seconds)
    sec = _epoch(F.col(ts_col))
    # A NULL timestamp has no place on a time axis — and engines
    # disagree on how NULL order keys join RANGE frames (the asof_join
    # null-ts rule): drop, mirrored by the oracle's WHERE ts IS NOT NULL.
    events = events.where(F.col(ts_col).isNotNull())
    wr = (
        Window.partitionBy(key_col)
        .orderBy(sec.alias("_sec"))
        .rangeBetween(-w, -1)
    )
    v = F.col(value_col)
    mean_prev = F.avg(v).over(wr)
    std_prev = F.stddev_samp(v).over(wr)
    return events.select(
        key_col,
        tiebreak,
        F.round(v, 6).alias("value"),
        F.count(v).over(wr).alias("n_prev"),
        F.round(mean_prev, 6).alias("mean_prev"),
        F.round(std_prev, 6).alias("std_prev"),
        F.round(
            F.when(std_prev > 0, (v - mean_prev) / std_prev), 6
        ).alias("zscore"),
    )


def cohort_retention(
    events: DataFrame,
    interval_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix — the classic activation analysis: each
    key's cohort is its FIRST active bin; cell (cohort, offset) counts
    the distinct keys of that cohort active ``offset`` bins later.
    ``offset`` 0 is the cohort size, so retention rate is
    n_keys / n_keys(offset=0) downstream.

    Plan: distinct (key, bin) — one shuffle doing the heavy dedup with
    map-side partials; per-key min(bin) — a narrow aggregate reusing
    the same key partitioning; join back on the key; one count-distinct
    aggregate on (cohort, offset). All integers: hashes exactly.
    NULL timestamps have no place on a time axis and are dropped.
    """
    b = int(interval_seconds)
    bins = (
        events.where(F.col(ts_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.floor(_epoch(F.col(ts_col)) / b).alias("bin"),
        )
        .distinct()
    )
    first = bins.groupBy("key").agg(F.min("bin").alias("cohort"))
    return (
        bins.join(first, "key")
        .groupBy("cohort", (F.col("bin") - F.col("cohort")).alias("offset_bins"))
        .agg(F.count_distinct("key").alias("n_keys"))
    )


def equidepth_bins(
    df: DataFrame,
    value_col: str,
    id_col: str,
    nbins: int,
    partitions: int = 32,
) -> DataFrame:
    """Exact equi-depth (equal-frequency) discretization — NTILE
    semantics over the global order ``(value, id)`` WITHOUT a global
    window: the feature-binning step of quantile-based
    discretization / monotonic-WOE encoding, where every bin must hold
    floor-or-ceil(n/nbins) rows no matter how skewed the values.

    Returns ``(id, value, bin)`` with ``bin`` in 1..nbins, exactly
    equal to SQL ``NTILE(nbins) OVER (ORDER BY value, id)``: the first
    ``n % nbins`` bins hold ``n//nbins + 1`` rows, the rest
    ``n//nbins``. NULL values are excluded (they have no place on a
    value axis; same contract as cohort_retention's null-ts drop).

    Scale shape — a naive NTILE is ONE partition sorting the entire
    table (the single worst plan at 100 TB). Instead the global rank is
    assembled the `sorted_neighborhood_pairs` way: ``repartitionByRange``
    on (value, id) → per-partition ``row_number`` (independent sorts)
    → broadcast exclusive prefix-sum of the B partition counts. The
    total row count rides the same B-row broadcast (no extra scan, no
    driver collect), and the bin index is pure integer arithmetic on
    the rank — exact past 2^53 and bit-equal to the DuckDB twin.
    """
    if nbins < 1:
        raise ValueError("nbins must be >= 1")
    keyed = (
        df.select(F.col(id_col).alias("id"), F.col(value_col).alias("value"))
        .where(F.col("value").isNotNull())
        .repartitionByRange(partitions, "value", "id")
        .withColumn("pid", F.spark_partition_id())
    )
    in_part = Window.partitionBy("pid").orderBy("value", "id")
    ranked = keyed.withColumn(
        "rank", (F.row_number().over(in_part) - 1).cast("long")
    ).localCheckpoint()
    counts = ranked.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
    off_w = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = counts.select(
        "pid",
        (F.sum("n").over(off_w) - F.col("n")).alias("offset"),
        F.sum("n").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    # NTILE: rank r (0-based) -> 1-based bucket. First `n % nbins`
    # buckets have q+1 rows where q = n DIV nbins. q can be 0 when
    # n < nbins (every row its own bucket, all in the "big" range) —
    # the else-branch division is then unreachable but still guarded.
    # Integral DIV throughout, so the bin index stays exact past 2^53.
    k = int(nbins)
    bucket_sql = (
        f"CAST(CASE WHEN _r < (total % {k}) * (total DIV {k} + 1) "
        f"THEN _r DIV (total DIV {k} + 1) "
        f"ELSE (total % {k}) "
        f"  + (_r - (total % {k}) * (total DIV {k} + 1)) "
        f"    DIV GREATEST(total DIV {k}, 1) "
        f"END + 1 AS INT)"
    )
    return (
        ranked.join(F.broadcast(offsets), "pid")
        .select(
            "id", "value",
            (F.col("offset") + F.col("rank")).alias("_r"), "total",
        )
        .select("id", "value", F.expr(bucket_sql).alias("bin"))
    )


def corr_matrix(df: DataFrame, cols: list[str], scale: int = 100) -> DataFrame:
    """Exact Pearson correlation matrix over fixed-point numeric columns
    in ONE aggregation pass -> (col_a, col_b, corr) for every unordered
    pair (col_a < col_b by position).

    The corpus-profiling primitive ("is token count confounded with
    quality score?") at its 100 TB shape: every sufficient statistic —
    n, per-column sums, and the upper-triangle sum of products — is a
    partial-aggregable aggregate in a SINGLE groupBy-less agg, so the
    whole matrix costs one scan and a one-row shuffle, never k scans or
    a per-pair job.

    Hash-exactness discipline: inputs are fixed-point (``scale`` = 100
    for 2-dp money/ratio columns), so ``round(x * scale)`` is the same
    exact integer in every engine; sums and products accumulate in
    decimal(38,0) (DuckDB twin: HUGEINT) — exact integer algebra — and
    the only floats are the final cast, two correctly-rounded sqrts and
    one division, identical IEEE ops on identical integers. Pearson is
    scale-invariant, so the fixed-point scaling cancels exactly.

    Rows with a NULL in ANY of ``cols`` are dropped (row-complete
    observations — the unambiguous one-pass semantics; pairwise-complete
    would need per-pair n/sums, which is the same plan with 3x the
    aggregate count, not a different shuffle shape).
    """
    if len(cols) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    complete = df
    for c in cols:
        complete = complete.where(F.col(c).isNotNull())
    ints = complete.select(
        *[
            F.round(F.col(c) * F.lit(int(scale)))
            .cast("long").cast("decimal(38,0)").alias(f"_x{i}")
            for i, c in enumerate(cols)
        ]
    )
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("_n")]
    for i in range(len(cols)):
        aggs.append(F.sum(F.col(f"_x{i}")).alias(f"_s{i}"))
        for j in range(i, len(cols)):
            aggs.append(
                F.sum(F.col(f"_x{i}") * F.col(f"_x{j}")).alias(f"_p{i}_{j}")
            )
    stats = ints.agg(*aggs)
    n = F.col("_n")
    pairs = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            num = (n * F.col(f"_p{i}_{j}") - F.col(f"_s{i}") * F.col(f"_s{j}"))
            va = (n * F.col(f"_p{i}_{i}") - F.col(f"_s{i}") * F.col(f"_s{i}"))
            vb = (n * F.col(f"_p{j}_{j}") - F.col(f"_s{j}") * F.col(f"_s{j}"))
            pairs.append(
                F.struct(
                    F.lit(cols[i]).alias("col_a"),
                    F.lit(cols[j]).alias("col_b"),
                    F.round(
                        num.cast("double")
                        / (F.sqrt(va.cast("double")) * F.sqrt(vb.cast("double"))),
                        6,
                    ).alias("corr"),
                )
            )
    return stats.select(F.explode(F.array(*pairs)).alias("p")).select(
        "p.col_a", "p.col_b", "p.corr"
    )


def drift_chisq(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    bins: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """Two-sample chi-square drift profile between two corpus snapshots
    -> one row per fixed-width bin of ``[lo, hi)``:
    ``(bin, n_a, n_b, expected_a, expected_b, contrib)``.

    The curation-monitoring primitive ("did this week's crawl shift the
    length/quality/score distribution?"): both sides histogram with the
    same partial-aggregable one-shuffle plan as :func:`histogram`, the
    B-side counts broadcast into a full outer merge on bin, and the
    classic two-sample statistic's per-bin contribution

        sum over s in {a, b} of (n_s,i - E_s,i)^2 / E_s,i,
        E_s,i = N_s * (n_a,i + n_b,i) / (N_a + N_b)

    is computed in-row from EXACT integer counts — divisions, squares
    and one subtraction only, no libm, so every row hashes bit-exactly
    cross-engine (the chi-square TOTAL is a float sum whose order is
    engine-dependent; callers sum the contribs, tests pin it). Bins
    where both sides are empty never appear; out-of-range values clamp
    into the edge bins (the histogram contract).
    """
    ha = histogram(df_a, value_col, [], bins, lo, hi).withColumnRenamed("n", "n_a")
    hb = histogram(df_b, value_col, [], bins, lo, hi).withColumnRenamed("n", "n_b")
    merged = (
        ha.join(hb, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
        .localCheckpoint(eager=False)
    )
    tot = merged.agg(
        F.sum("n_a").alias("na_tot"), F.sum("n_b").alias("nb_tot")
    )
    j = merged.join(F.broadcast(tot))
    row = F.col("n_a") + F.col("n_b")
    grand = F.col("na_tot") + F.col("nb_tot")
    ea = F.col("na_tot").cast("double") * row.cast("double") / grand.cast("double")
    eb = F.col("nb_tot").cast("double") * row.cast("double") / grand.cast("double")
    da = F.col("n_a").cast("double") - ea
    db_ = F.col("n_b").cast("double") - eb
    return j.select(
        "bin", "n_a", "n_b",
        F.round(ea, 6).alias("expected_a"),
        F.round(eb, 6).alias("expected_b"),
        F.round(da * da / ea + db_ * db_ / eb, 6).alias("contrib"),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    by: Sequence[str],
    k: float = 3.5,
    approx: bool = False,
) -> DataFrame:
    """Robust per-group outlier detection: flag rows whose absolute
    deviation from the group median exceeds ``k`` group-MADs (median
    absolute deviation — the Iglewicz–Hoaglin robust z-score family,
    immune to the outliers it hunts, unlike mean/stddev).

    Reference analogue: the per-epoch metric collection the service
    stores (/root/reference/src/utils/crud.py metrics rows) has no
    outlier guard at all; this is the batch QA operator a corpus-scale
    metrics table needs.

    Plan shape (inherently two aggregation passes — MAD needs the
    median first):
      1. groupBy(by) -> exact ``percentile`` median (``approx=True``
         switches both passes to ``approx_percentile``, the 100 TB path
         where buffering a group's values is not an option);
      2. join medians back (group-cardinality rows — AQE broadcasts),
         groupBy again for the MAD;
      3. one final scan emits flagged rows with their robust z.
    Groups with MAD = 0 (constant-majority) emit nothing — every
    non-median value would be infinitely deviant; callers wanting those
    should pre-filter constants explicitly.
    """
    fn = "approx_percentile" if approx else "percentile"
    med = df.groupBy(*by).agg(
        F.expr(f"{fn}(`{value_col}`, 0.5D)").alias("med")
    )
    dev = df.join(med, list(by)).withColumn(
        "adev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(*by).agg(F.expr(f"{fn}(adev, 0.5D)").alias("mad"))
    out = dev.join(mad, list(by)).where(
        (F.col("mad") > 0) & (F.col("adev") > F.lit(float(k)) * F.col("mad"))
    )
    keep = [c for c in df.columns if c not in by and c != value_col]
    return out.select(
        *by,
        *keep,
        F.round(F.col(value_col), 6).alias(value_col),
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        F.round(F.col("adev") / F.col("mad"), 6).alias("robust_z"),
    )


def grouped_ols(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: Sequence[str],
    x_scale: int = 1,
    y_scale: int = 100,
) -> DataFrame:
    """Per-group simple linear regression (OLS of y on x) in ONE
    partial-aggregable pass — the trend detector for metric/quality
    drift ("is this source's quality score sliding over time?").

    Same hash-exactness discipline as :func:`corr_matrix`: inputs are
    fixed-point (``round(v * scale)`` is the same exact integer in every
    engine), every sufficient statistic (n, Σx, Σy, Σxy, Σx², Σy²)
    accumulates in decimal(38,0) / HUGEINT integer algebra — immune to
    float-sum ordering, which a distributed partial aggregation cannot
    pin — and floats appear only in the final slope/intercept/r²
    expressions, identical IEEE DAGs on identical integers.

    Returns (by..., n, slope, intercept, r2), slope/intercept in
    ORIGINAL units (the fixed-point scales cancel via the single
    ``x_scale/y_scale`` factor). Groups with constant x (zero variance)
    are dropped — no line exists; constant y emits slope 0 with r2 NULL
    (0/0). Overflow audit: |x_int| ≤ 2e9 (epoch seconds), |y_int| ≤
    5e7 at scale 100 ⇒ n·Σx² ≤ 1e38 holds to ~1e12 rows per group;
    width the caller controls via the scales.
    """
    d38 = "decimal(38,0)"
    ints = df.select(
        *by,
        F.round(F.col(x_col).cast("double") * F.lit(int(x_scale)))
        .cast("long").cast(d38).alias("_x"),
        F.round(F.col(y_col).cast("double") * F.lit(int(y_scale)))
        .cast("long").cast(d38).alias("_y"),
    ).where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    stats = ints.groupBy(*by).agg(
        F.count(F.lit(1)).cast(d38).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    n, sx, sy = F.col("_n"), F.col("_sx"), F.col("_sy")
    num = (n * F.col("_sxy") - sx * sy).cast("double")
    den = (n * F.col("_sxx") - sx * sx).cast("double")
    deny = (n * F.col("_syy") - sy * sy).cast("double")
    unit = float(x_scale) / float(y_scale)  # y_int/x_int -> y/x units
    slope = (num / den) * F.lit(unit)
    mean_y = sy.cast("double") / (n.cast("double") * F.lit(float(y_scale)))
    mean_x = sx.cast("double") / (n.cast("double") * F.lit(float(x_scale)))
    return stats.where(den != 0.0).select(
        *by,
        n.cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(mean_y - slope * mean_x, 6).alias("intercept"),
        F.when(deny != 0.0, F.round((num * num) / (den * deny), 6)).alias("r2"),
    )
