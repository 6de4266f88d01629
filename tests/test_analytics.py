"""Relational-analytics operators (operators/analytics.py) vs
independent brute-force oracles: as-of join, interval range join,
timeline window features, exact/approx grouped quantiles, rollup,
pivot. Same strategy as test_graph.py — small hand-built inputs whose
expected outputs are computed with plain Python loops."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from pg_iui_ner_api_spark.operators import analytics as A

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def _events(spark, rows):
    # rows: (event_id, user_id, secs_from_t0, kind, value)
    return spark.createDataFrame(
        [
            Row(event_id=i, user_id=u, ts=_ts(s), event_type=k, value=float(v))
            for (i, u, s, k, v) in rows
        ]
    )


ROWS = [
    # user 1: clicks at 0, 100, 100 (dup ts, ids 2<3), purchase at 100, 400
    (1, 1, 0, "click", 1.0),
    (2, 1, 100, "click", 2.0),
    (3, 1, 100, "click", 3.0),
    (4, 1, 100, "purchase", 10.0),
    (5, 1, 400, "purchase", 20.0),
    # user 2: purchase before any click (no backward match), click after
    (6, 2, 50, "purchase", 5.0),
    (7, 2, 60, "click", 1.5),
    # user 3: clicks only
    (8, 3, 10, "click", 7.0),
]


def _brute_asof(rows, direction, tolerance=None):
    out = {}
    for (i, u, s, k, v) in rows:
        if k != "purchase":
            continue
        cands = [
            (cs, ci)
            for (ci, cu, cs, ck, _) in rows
            if ck == "click" and cu == u and (cs <= s if direction == "backward" else cs >= s)
        ]
        if direction == "backward":
            best = max(cands, key=lambda t: (t[0], t[1]), default=None)
        else:
            best = min(cands, key=lambda t: (t[0], t[1]), default=None)
        if best is not None and tolerance is not None and abs(best[0] - s) > tolerance:
            best = None
        out[i] = best  # (secs, click_id) or None
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_bruteforce(spark, direction):
    ev = _events(spark, ROWS)
    left = ev.where(F.col("event_type") == "purchase")
    right = ev.where(F.col("event_type") == "click")
    got = {
        r["event_id"]: (r["matched_ts"], r["event_id_r"])
        for r in A.asof_join(
            left, right, ["user_id"], right_cols=["event_id"], tiebreak="event_id",
            direction=direction,
        ).collect()
    }
    exp = _brute_asof(ROWS, direction)
    assert set(got) == set(exp)
    epoch0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    for eid, best in exp.items():
        m_ts, m_id = got[eid]
        if best is None:
            assert m_ts is None and m_id is None
        else:
            assert m_id == best[1]
            # matched_ts is epoch seconds of the matched click (session tz
            # is UTC in get_spark, so the offset is exactly epoch0+secs)
            assert m_ts == epoch0 + best[0]


def test_asof_join_tolerance_nulls_far_matches(spark):
    ev = _events(spark, ROWS)
    left = ev.where(F.col("event_type") == "purchase")
    right = ev.where(F.col("event_type") == "click")
    got = {
        r["event_id"]: r["event_id_r"]
        for r in A.asof_join(
            left, right, ["user_id"], right_cols=["event_id"],
            tiebreak="event_id", tolerance_seconds=100,
        ).collect()
    }
    exp = _brute_asof(ROWS, "backward", tolerance=100)
    assert got == {k: (v[1] if v else None) for k, v in exp.items()}


def test_asof_join_null_right_ts_never_matches(spark):
    """A right row with a NULL timestamp must be invisible to the as-of
    stream: before the fix its NULL _pos sorted nulls-first and became a
    spurious head-of-partition match (populated *_r, NULL matched_ts)
    for left rows with no real predecessor."""
    left = _events(spark, [(1, 2, 50, "purchase", 5.0)])  # user 2, t=50
    right = spark.createDataFrame(
        [Row(event_id=99, user_id=2, ts=None, event_type="click", value=1.0)],
        "event_id int, user_id int, ts timestamp, event_type string, value double",
    )
    out = A.asof_join(
        left, right, ["user_id"], right_cols=["event_id"], tiebreak="event_id"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["matched_ts"] is None and r["event_id_r"] is None
    assert r["gap_seconds"] is None


def test_asof_tie_rule_matches_duckdb(spark):
    """The pinned tie rule (equal right ts -> max tiebreak for backward)
    against an independent DuckDB lateral formulation."""
    duckdb = pytest.importorskip("duckdb")
    ev = _events(spark, ROWS)
    left = ev.where(F.col("event_type") == "purchase")
    right = ev.where(F.col("event_type") == "click")
    got = sorted(
        (r["event_id"], r["event_id_r"])
        for r in A.asof_join(
            left, right, ["user_id"], right_cols=["event_id"], tiebreak="event_id"
        ).collect()
    )
    pdf = ev.toPandas()
    con = duckdb.connect()
    con.register("ev", pdf)
    exp = sorted(
        map(
            tuple,
            con.execute(
                """
        SELECT p.event_id,
               (SELECT c.event_id FROM ev c
                 WHERE c.event_type='click' AND c.user_id=p.user_id AND c.ts<=p.ts
                 ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
        FROM ev p WHERE p.event_type='purchase'
        """
            ).fetchall(),
        )
    )
    assert got == exp


def test_range_join_containment(spark):
    iv = spark.createDataFrame(
        [
            Row(user_id=1, iv_id=10, s_start=100, s_end=200),
            Row(user_id=1, iv_id=11, s_start=5000, s_end=90000),  # many buckets
            Row(user_id=2, iv_id=20, s_start=0, s_end=50),
        ]
    )
    pts = _events(
        spark,
        [
            (1, 1, 100, "x", 0),   # boundary start -> iv 10
            (2, 1, 200, "x", 0),   # boundary end -> iv 10
            (3, 1, 201, "x", 0),   # outside
            (4, 1, 80000, "x", 0), # inside long interval
            (5, 2, 25, "x", 0),    # iv 20
            (6, 3, 25, "x", 0),    # wrong key
        ],
    )
    epoch0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    iv = iv.select(
        "user_id", "iv_id",
        (F.col("s_start") + epoch0).alias("s_start"),
        (F.col("s_end") + epoch0).alias("s_end"),
    )
    got = sorted(
        (r["event_id"], r["iv_id"])
        for r in A.range_join(
            iv, pts, ["user_id"], bucket_seconds=600
        ).collect()
    )
    assert got == [(1, 10), (2, 10), (4, 11), (5, 20)]


def test_range_join_no_duplicate_pairs(spark):
    # an interval covering many buckets must still match a point once
    epoch0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    iv = spark.createDataFrame(
        [Row(user_id=1, iv_id=1, s_start=epoch0, s_end=epoch0 + 100000)]
    )
    pts = _events(spark, [(1, 1, 3600, "x", 0)])
    assert A.range_join(iv, pts, ["user_id"], bucket_seconds=60).count() == 1


def test_range_join_inverted_interval_filtered(spark):
    # end < start is corrupt: Spark's sequence would silently count DOWN
    # and still emit buckets; the guard filters the row instead.
    epoch0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    iv = spark.createDataFrame(
        [Row(user_id=1, iv_id=1, s_start=epoch0 + 100000, s_end=epoch0)]
    )
    pts = _events(spark, [(1, 1, 3600, "x", 0)])
    assert A.range_join(iv, pts, ["user_id"], bucket_seconds=60).count() == 0


def test_range_join_runaway_interval_errors(spark):
    # a far-future end must fail fast, not explode to millions of rows
    epoch0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    iv = spark.createDataFrame(
        [Row(user_id=1, iv_id=1, s_start=epoch0, s_end=epoch0 + 10_000_000)]
    )
    pts = _events(spark, [(1, 1, 3600, "x", 0)])
    with pytest.raises(Exception, match="too many buckets"):
        A.range_join(
            iv, pts, ["user_id"], bucket_seconds=60,
            max_buckets_per_interval=1000,
        ).count()


def test_timeline_features_bruteforce(spark):
    ev = _events(spark, ROWS)
    got = {
        (r["user_id"], r["event_id"]): (
            r["seq"], r["prev_value"], r["run_sum"], r["ma"]
        )
        for r in A.timeline_features(ev, ma_window=2).collect()
    }
    by_user = {}
    for (i, u, s, k, v) in sorted(ROWS, key=lambda t: (t[1], t[2], t[0])):
        by_user.setdefault(u, []).append((i, float(v)))
    exp = {}
    for u, evs in by_user.items():
        run = 0.0
        for n, (i, v) in enumerate(evs):
            run += v
            prev = evs[n - 1][1] if n else None
            window = [x for _, x in evs[max(0, n - 1): n + 1]]
            exp[(u, i)] = (n + 1, prev, round(run, 6), round(sum(window) / len(window), 6))
    assert got == exp


def test_grouped_quantiles_match_numpy(spark):
    np = pytest.importorskip("numpy")
    vals = [float(x) for x in [5, 1, 9, 3, 3, 7, 2, 8, 6, 4]]
    df = spark.createDataFrame([Row(g="a", v=v) for v in vals])
    row = A.grouped_quantiles(df, "v", ["g"]).collect()[0]
    assert row["n"] == 10
    for col, q in [("q25", 25), ("q50", 50), ("q75", 75)]:
        assert row[col] == pytest.approx(float(np.percentile(vals, q)), abs=1e-6)


def test_grouped_quantiles_approx_close_to_exact(spark):
    df = spark.range(0, 2000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") % 97).cast("double").alias("v")
    )
    exact = {r["g"]: r["q50"] for r in A.grouped_quantiles(df, "v", ["g"]).collect()}
    approx = {
        r["g"]: r["q50"]
        for r in A.grouped_quantiles(df, "v", ["g"], approx=True).collect()
    }
    for g, e in exact.items():
        assert abs(approx[g] - e) <= 5.0  # sketch error bound at default accuracy


def test_rollup_summary_levels(spark):
    df = spark.createDataFrame(
        [Row(a="x", b="p", v=1.0), Row(a="x", b="q", v=2.0), Row(a="y", b="p", v=4.0)]
    )
    rows = {
        (r["a"], r["b"]): (r["n"], r["total"], r["lvl"])
        for r in A.rollup_summary(df, ["a", "b"], "v").collect()
    }
    assert rows[("x", "p")] == (1, 1.0, 0)
    assert rows[("x", None)] == (2, 3.0, 1)
    assert rows[("y", None)] == (1, 4.0, 1)
    assert rows[(None, None)] == (3, 7.0, 2)
    assert len(rows) == 6


def test_pivot_counts(spark):
    df = spark.createDataFrame(
        [Row(k="u1", t="a"), Row(k="u1", t="a"), Row(k="u1", t="b"), Row(k="u2", t="b")]
    )
    got = {r["k"]: (r["a"], r["b"]) for r in A.pivot_counts(df, "k", "t", ["a", "b"]).collect()}
    assert got == {"u1": (2, 1), "u2": (0, 1)}


def test_topk_per_group_matches_python(spark):
    from pg_iui_ner_api_spark.operators import analytics as A

    rows = [(i, f"g{i % 4}", float((i * 7) % 23)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    got = {(r["grp"], r["rank"]): r["id"]
           for r in A.topk_per_group(df, ["grp"], "v", k=3, tiebreak="id").collect()}
    by_grp = {}
    for i, g, v in rows:
        by_grp.setdefault(g, []).append((-v, i))
    want = {(g, rk + 1): i
            for g, vs in by_grp.items()
            for rk, (_, i) in enumerate(sorted(vs)[:3])}
    assert got == want


def test_profile_table_exact_and_approx(spark):
    from pg_iui_ner_api_spark.operators import analytics as A

    rows = [(i, f"v{i % 5}" if i % 7 else None, float(i % 3)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    got = {r["column"]: r for r in
           A.profile_table(df, approx=False).collect()}
    assert got["id"]["n_rows"] == 200 and got["id"]["n_nonnull"] == 200
    assert got["id"]["n_distinct"] == 200
    assert got["id"]["min_val"] == "0" and got["id"]["max_val"] == "199"
    nulls = sum(1 for _, s, _ in rows if s is None)
    assert got["s"]["n_nonnull"] == 200 - nulls
    assert got["s"]["n_distinct"] == 5
    assert got["v"]["min_val"] == "0.0" and got["v"]["max_val"] == "2.0"
    # approx: HLL distinct within its error bound; other stats exact
    ap = {r["column"]: r for r in A.profile_table(df).collect()}
    assert ap["s"]["n_nonnull"] == 200 - nulls
    assert abs(ap["id"]["n_distinct"] - 200) <= 10


def test_funnel_ordered_completion(spark):
    """Order matters: a purchase BEFORE the click must not count; the
    inclusive rule means same-second steps do."""
    import datetime as dt

    from pg_iui_ner_api_spark.operators import analytics as A

    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # u1 completes in order
        (1, 1, T(0), "signup"), (2, 1, T(5), "click"), (3, 1, T(9), "purchase"),
        # u2: purchase precedes click -> stages 2, no conversion
        (4, 2, T(0), "signup"), (5, 2, T(1), "purchase"), (6, 2, T(8), "click"),
        # u3: same-second signup+click (inclusive) then purchase
        (7, 3, T(4), "signup"), (8, 3, T(4), "click"), (9, 3, T(6), "purchase"),
        # u4: click only (no signup) -> stages 0
        (10, 4, T(2), "click"),
        # u5: unrelated events only -> stages 0
        (11, 5, T(3), "error"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = {r["user"]: (r["stages"], r["t_final"]) for r in
           A.funnel(df, ["signup", "click", "purchase"], "user_id").collect()}
    base = int(T(0).timestamp())
    assert got[1] == (3, base + 9)
    assert got[2] == (2, None)
    assert got[3] == (3, base + 6)
    assert got[4] == (0, None)
    assert got[5] == (0, None)


def test_histogram_clamps_and_counts(spark):
    from pg_iui_ner_api_spark.operators import analytics as A

    rows = [("a", -5.0), ("a", 0.0), ("a", 9.9), ("a", 10.0), ("a", 99.0),
            ("a", 250.0), ("b", 55.0), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {(r["g"], r["bin"]): r["n"] for r in
           A.histogram(df, "v", ["g"], bins=10, lo=0.0, hi=100.0).collect()}
    # -5 clamps into bin 0; 250 clamps into bin 9; None dropped
    assert got[("a", 0)] == 3      # -5.0, 0.0, 9.9
    assert got[("a", 1)] == 1      # 10.0
    assert got[("a", 9)] == 2      # 99.0, 250.0
    assert got[("b", 5)] == 1
    assert sum(got.values()) == 7


def test_cube_summary_all_groupings(spark):
    from pg_iui_ner_api_spark.operators import analytics as A

    rows = [("x", "p", 1.0), ("x", "q", 2.0), ("y", "p", 4.0)]
    df = spark.createDataFrame(rows, "d1 string, d2 string, v double")
    got = {(r["d1"], r["d2"]): (r["n"], r["total"], r["lvl"]) for r in
           A.cube_summary(df, ["d1", "d2"], "v").collect()}
    assert got[(None, None)] == (3, 7.0, 2)        # grand total
    assert got[("x", None)] == (2, 3.0, 1)
    assert got[(None, "p")] == (2, 5.0, 1)         # cube-only grouping
    assert got[("y", "p")] == (1, 4.0, 0)
    assert len(got) == 3 + 2 + 2 + 1               # cells+rows+cols+total


def test_resample_ffill_gap_filling(spark):
    import datetime as dt

    from pg_iui_ner_api_spark.operators import analytics as A

    T = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        (1, 7, T(0), 10.0),                     # bin 0
        (2, 7, T(1), 11.0),                     # bin 1
        (3, 7, T(10), 30.0),                    # bin 10 (gap 2..9 filled)
        (4, 8, T(5), 5.0),                      # single-bin key
        (5, 7, T(1), 12.0),                     # same ts as id 2 -> tiebreak wins
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    got = {(r["key"], int(r["bin"] - rows[0][2].timestamp() // 60)): (r["value"], r["filled"])
           for r in A.resample_ffill(df, 60).collect()}
    assert got[(7, 0)] == (10.0, False)
    # same-ts tie in bin 1: the greater event_id (5 -> 12.0) wins
    assert got[(7, 1)] == (12.0, False)
    for b in range(2, 10):
        assert got[(7, b)] == (12.0, True)      # forward-filled gap
    assert got[(7, 10)] == (30.0, False)
    assert got[(8, 5)] == (5.0, False)
    assert len(got) == 12


def test_histogram_rejects_degenerate_range(spark):
    from pg_iui_ner_api_spark.operators import analytics as A

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    import pytest as _pt
    with _pt.raises(ValueError):
        A.histogram(df, "v", ["g"], bins=0, lo=0.0, hi=1.0)
    with _pt.raises(ValueError):
        A.histogram(df, "v", ["g"], bins=5, lo=1.0, hi=1.0)


def test_cube_lvl_distinguishes_data_null_from_subtotal(spark):
    # A genuine NULL data value at the finest grain must keep lvl=0;
    # the subtotal row sharing its dim values gets lvl>0 (grouping(),
    # not isNull, decides).
    rows = [(None, "p", 1.0), ("x", "p", 2.0)]
    df = spark.createDataFrame(rows, "d1 string, d2 string, v double")
    got = {(r["d1"], r["d2"], r["lvl"]): (r["n"], r["total"]) for r in
           A.cube_summary(df, ["d1", "d2"], "v").collect()}
    assert got[(None, "p", 0)] == (1, 1.0)   # detail row, NULL data value
    assert got[(None, "p", 1)] == (2, 3.0)   # d1 rolled up
    assert got[(None, None, 2)] == (2, 3.0)  # grand total
    r = {(x["d1"], x["d2"], x["lvl"]): (x["n"], x["total"]) for x in
         A.rollup_summary(df, ["d1", "d2"], "v").collect()}
    assert r[(None, "p", 0)] == (1, 1.0)
    assert r[(None, None, 1)] == (1, 1.0)    # rollup of the NULL-d1 group
    assert r[(None, None, 2)] == (2, 3.0)


def test_grouped_quantiles_fractional_labels_and_odd_names(spark):
    df = spark.createDataFrame(
        [("g", float(i)) for i in range(1, 101)], "grp string, `order value` double"
    )
    out = A.grouped_quantiles(
        df, "order value", ["grp"], qs=(0.5, 0.99, 0.999), approx=False
    )
    assert set(out.columns) == {"grp", "n", "q50", "q99", "q99_9"}
    row = out.collect()[0]
    assert row["q50"] == pytest.approx(50.5)
    assert row["q99"] < row["q99_9"] <= 100.0
    with pytest.raises(ValueError):
        A.grouped_quantiles(df, "order value", ["grp"], qs=(0.25, 0.250))


def test_histogram_excludes_nan(spark):
    df = spark.createDataFrame(
        [("a", 5.0), ("a", float("nan")), ("a", None)], "g string, v double"
    )
    got = {r["bin"]: r["n"] for r in
           A.histogram(df, "v", ["g"], bins=10, lo=0.0, hi=100.0).collect()}
    assert got == {0: 1}  # NaN not clamped into bin 9, None dropped


def test_topk_per_group_rejects_existing_rank_column(spark):
    df = spark.createDataFrame([(1, "g", 1.0)], "rank long, grp string, v double")
    with pytest.raises(ValueError, match="rank"):
        A.topk_per_group(df, ["grp"], "v", k=1)


# ---------------------------------------------------------------------------
# key-skew profiler
# ---------------------------------------------------------------------------
def test_key_skew_top_heavy_keys(spark):
    from pg_iui_ner_api_spark.operators.analytics import key_skew

    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 15 + [("d",)] * 5
    df = spark.createDataFrame(rows, schema=["k"])
    got = [
        (r["key"], r["cnt"], r["share"], r["rank"])
        for r in key_skew(df, "k", top_n=3).orderBy("rank").collect()
    ]
    assert got == [
        ("a", 50, 0.50, 1),
        ("b", 30, 0.30, 2),
        ("c", 15, 0.15, 3),
    ]


def test_key_skew_deterministic_ties(spark):
    from pg_iui_ner_api_spark.operators.analytics import key_skew

    rows = [("x",)] * 3 + [("y",)] * 3 + [("z",)] * 3
    df = spark.createDataFrame(rows, schema=["k"])
    got = [r["key"] for r in key_skew(df, "k", top_n=2).orderBy("rank").collect()]
    assert got == ["x", "y"]  # equal counts break ties by key, stably


# ---------------------------------------------------------------------------
# SCD2 dimension build
# ---------------------------------------------------------------------------
def test_scd2_build_episodes(spark):
    from pg_iui_ner_api_spark.operators.analytics import scd2_build

    rows = [
        # key, ts, city
        ("u1", 1, "paris"),
        ("u1", 2, "paris"),    # no-op change: collapsed
        ("u1", 3, "tokyo"),
        ("u1", 5, "paris"),    # back again: NEW episode, not merged
        ("u2", 1, None),       # null attr state is a real episode
        ("u2", 4, "rome"),     # null -> value transition must survive
        ("u2", 6, None),       # value -> null transition too
    ]
    df = spark.createDataFrame(rows, schema=["k", "ts", "city"])
    got = sorted(
        (
            (r["k"], r["city"], r["valid_from"], r["valid_to"])
            for r in scd2_build(df, "k", "ts", ["city"]).collect()
        ),
        key=lambda t: (t[0], t[2]),
    )
    assert got == [
        ("u1", "paris", 1, 3),
        ("u1", "tokyo", 3, 5),
        ("u1", "paris", 5, None),
        ("u2", None, 1, 4),
        ("u2", "rome", 4, 6),
        ("u2", None, 6, None),
    ]


def test_scd2_single_exchange(spark):
    from pg_iui_ner_api_spark.operators.analytics import scd2_build

    df = spark.createDataFrame(
        [("u1", 1, "a"), ("u1", 2, "b")], schema=["k", "ts", "city"]
    )
    plan = (
        scd2_build(df, "k", "ts", ["city"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan  # both windows share one shuffle
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# sweep-line interval coverage
# ---------------------------------------------------------------------------
def _py_coverage(intervals):
    deltas = {}
    for s, e in intervals:
        deltas[s] = deltas.get(s, 0) + 1
        deltas[e] = deltas.get(e, 0) - 1
    out, run = {}, 0
    for t in sorted(deltas):
        run += deltas[t]
        out[t] = run
    return out


def test_interval_coverage_matches_sweep(spark):
    from pg_iui_ner_api_spark.operators.analytics import interval_coverage

    ivals = [(1, 5), (2, 8), (3, 5), (5, 9), (10, 12), (10, 11), (1, 2)]
    df = spark.createDataFrame(ivals, schema=["s", "e"])
    got = {r["ts"]: r["n_active"] for r in interval_coverage(df, "s", "e").collect()}
    assert got == _py_coverage(ivals)
    # half-open semantics: at ts=5 the two intervals ending there are out
    assert got[5] == 2  # (2,8) and (5,9)
    # coverage returns to zero after the last end
    assert got[max(got)] == 0


def test_interval_coverage_partition_count_invariant(spark):
    from pg_iui_ner_api_spark.operators.analytics import interval_coverage

    ivals = [(i % 17, i % 17 + 1 + i % 5) for i in range(200)]
    df = spark.createDataFrame(ivals, schema=["s", "e"])
    a = {r["ts"]: r["n_active"] for r in interval_coverage(df, "s", "e", partitions=2).collect()}
    b = {r["ts"]: r["n_active"] for r in interval_coverage(df, "s", "e", partitions=37).collect()}
    assert a == b == _py_coverage(ivals)


def test_scd2_null_first_attr_matches_duckdb_twin(spark):
    """A key whose chronologically FIRST attr is NULL is a real episode.
    The operator keeps it via struct-null lag semantics; the DuckDB twin
    (the scd2_dim oracle shape) needs the has_prev marker to agree —
    pinned here so the latent divergence can't regress."""
    duckdb = pytest.importorskip("duckdb")

    rows = [("u1", 1, None), ("u1", 3, "x"), ("u2", 1, "a")]
    df = spark.createDataFrame(rows, schema="k string, ts long, v string")
    got = sorted(
        (
            (r["k"], r["v"], r["valid_from"], r["valid_to"])
            for r in A.scd2_build(df, "k", "ts", ["v"]).collect()
        ),
        key=lambda t: (t[0], t[2]),
    )
    con = duckdb.connect()
    con.register("t", df.toPandas())
    exp = sorted(
        map(
            tuple,
            con.execute(
                """
        WITH s AS (
          SELECT k, ts, v,
                 lag(v) OVER (PARTITION BY k ORDER BY ts, v) AS prev,
                 lag(TRUE) OVER (PARTITION BY k ORDER BY ts, v) AS has_prev
          FROM t
        ),
        c AS (SELECT k, ts, v FROM s
              WHERE has_prev IS NULL OR v IS DISTINCT FROM prev)
        SELECT k, v, ts AS valid_from,
               lead(ts) OVER (PARTITION BY k ORDER BY ts, v) AS valid_to
        FROM c
        """
            ).fetchall(),
        ),
        key=lambda t: (t[0], t[2]),
    )
    assert got == exp
    assert ("u1", None, 1, 3) in got  # the NULL-first episode survives


# ---------------------------------------------------------------------------
# equidepth_bins (exact NTILE without a global window)
# ---------------------------------------------------------------------------
def _py_ntile(pairs, nbins):
    """Independent reference: sort + sequential fill (SQL NTILE spec)."""
    s = sorted(pairs, key=lambda t: (t[1], t[0]))
    n = len(s)
    q, rem = divmod(n, nbins)
    out, r = {}, 0
    for b in range(1, nbins + 1):
        for _ in range(q + (1 if b <= rem else 0)):
            out[s[r][0]] = b
            r += 1
    return out


def _bins_df(spark, pairs):
    return spark.createDataFrame(
        [(i, v) for i, v in pairs], schema="rid long, val double"
    )


def test_equidepth_matches_ntile_oracle(spark):
    pairs = [(i, float((i * 37) % 101)) for i in range(100)]
    for nbins in (1, 3, 7):
        got = {
            r["id"]: r["bin"]
            for r in A.equidepth_bins(
                _bins_df(spark, pairs), "val", "rid", nbins, partitions=4
            ).collect()
        }
        assert got == _py_ntile(pairs, nbins), nbins


def test_equidepth_bin_sizes_differ_by_at_most_one(spark):
    pairs = [(i, float(i % 5)) for i in range(103)]  # heavy value ties
    rows = A.equidepth_bins(
        _bins_df(spark, pairs), "val", "rid", 10, partitions=4
    ).collect()
    sizes = {}
    for r in rows:
        sizes[r["bin"]] = sizes.get(r["bin"], 0) + 1
    assert sorted(sizes) == list(range(1, 11))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # ties on value are broken by id: same-value rows fill bins in id order
    assert {r["id"]: r["bin"] for r in rows} == _py_ntile(pairs, 10)


def test_equidepth_fewer_rows_than_bins(spark):
    pairs = [(1, 5.0), (2, 1.0), (3, 3.0)]
    got = {
        r["id"]: r["bin"]
        for r in A.equidepth_bins(
            _bins_df(spark, pairs), "val", "rid", 7, partitions=2
        ).collect()
    }
    # n < nbins: every row its own bucket in value order
    assert got == {2: 1, 3: 2, 1: 3}


def test_equidepth_excludes_nulls_and_rejects_bad_nbins(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, 2.0), (2, None), (3, 1.0)], schema="rid long, val double"
    )
    rows = A.equidepth_bins(df, "val", "rid", 2, partitions=2).collect()
    assert {r["id"] for r in rows} == {1, 3}
    with _pytest.raises(ValueError):
        A.equidepth_bins(df, "val", "rid", 0)


# ---------------------------------------------------------------------------
# one-pass exact correlation matrix
# ---------------------------------------------------------------------------
def test_corr_matrix_matches_numpy(spark):
    import numpy as np

    from pg_iui_ner_api_spark.operators.analytics import corr_matrix

    rows = [(float(i % 7), float((i * 3) % 11) / 2, float(50 - i) / 4)
            for i in range(200)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {(r.col_a, r.col_b): r.corr
           for r in corr_matrix(df, ["a", "b", "c"], scale=100).collect()}
    m = np.corrcoef(np.round(np.array(rows).T * 100))
    names = ["a", "b", "c"]
    for i in range(3):
        for j in range(i + 1, 3):
            assert abs(got[(names[i], names[j])] - m[i, j]) < 1e-5


def test_corr_matrix_null_rows_dropped_and_args(spark):
    import pytest as _pytest

    from pg_iui_ner_api_spark.operators.analytics import corr_matrix

    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.0), (None, 9.0), (3.0, 6.0)],
        "a double, b double",
    )
    # perfectly linear after the null row drops
    r = corr_matrix(df, ["a", "b"]).first()
    assert r.corr == 1.0
    with _pytest.raises(ValueError):
        corr_matrix(df, ["a"])


def test_corr_matrix_single_pass_plan(spark):
    from pg_iui_ner_api_spark.operators.analytics import corr_matrix

    df = spark.createDataFrame([(1.0, 2.0, 3.0)], "a double, b double, c double")
    plan = corr_matrix(df, ["a", "b", "c"])._jdf.queryExecution(
    ).executedPlan().toString()
    # all statistics in one aggregation: exactly one pair of
    # HashAggregates (partial + final) and no join
    assert plan.count("Exchange") <= 1
    assert "Join" not in plan


def test_drift_chisq_matches_python_reference(spark):
    import collections

    from pg_iui_ner_api_spark.operators.analytics import drift_chisq

    va = [float((i * 7) % 100) for i in range(300)]
    vb = [float((i * 7) % 100 + (20 if i % 3 == 0 else 0)) for i in range(240)]
    a = spark.createDataFrame([(x,) for x in va], "v double")
    b = spark.createDataFrame([(x,) for x in vb], "v double")
    rows = drift_chisq(a, b, "v", 5, 0.0, 100.0).collect()

    def binof(x):
        return min(max(int((x - 0.0) // 20.0), 0), 4)

    ca = collections.Counter(binof(x) for x in va)
    cb = collections.Counter(binof(x) for x in vb)
    na, nb = len(va), len(vb)
    want = 0.0
    for i in set(ca) | set(cb):
        r = ca[i] + cb[i]
        ea, eb = na * r / (na + nb), nb * r / (na + nb)
        want += (ca[i] - ea) ** 2 / ea + (cb[i] - eb) ** 2 / eb
    got = sum(r.contrib for r in rows)
    assert abs(got - want) < 1e-4
    assert {(r.bin, r.n_a, r.n_b) for r in rows} == {
        (i, ca.get(i, 0), cb.get(i, 0)) for i in set(ca) | set(cb)
    }


def test_drift_chisq_identical_distributions_near_zero(spark):
    from pg_iui_ner_api_spark.operators.analytics import drift_chisq

    vals = [(float(i % 50),) for i in range(500)]
    a = spark.createDataFrame(vals, "v double")
    b = spark.createDataFrame(vals, "v double")
    rows = drift_chisq(a, b, "v", 10, 0.0, 50.0).collect()
    assert all(r.contrib == 0.0 for r in rows)
    assert len(rows) == 10


def test_mad_outliers_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    for g in ("a", "b"):
        base = rng.normal(50 if g == "a" else -10, 5, 97)
        spikes = [500.0, -400.0, 51.0]  # two far outliers + one inlier
        for i, v in enumerate(list(base) + spikes):
            rows.append((g, i, float(v)))
    df = spark.createDataFrame(rows, "grp string, rid long, value double")
    got = {
        (r["grp"], r["rid"])
        for r in A.mad_outliers(df, "value", ["grp"], k=3.5).collect()
    }
    want = set()
    for g in ("a", "b"):
        vals = np.array([v for gg, _, v in rows if gg == g])
        med = np.median(vals)
        mad = np.median(np.abs(vals - med))
        for gg, i, v in rows:
            if gg == g and mad > 0 and abs(v - med) > 3.5 * mad:
                want.add((g, i))
    assert got == want
    assert ("a", 97) in got and ("b", 98) in got  # the planted spikes


def test_mad_outliers_constant_group_emits_nothing(spark):
    df = spark.createDataFrame(
        [("c", i, 5.0) for i in range(9)] + [("c", 9, 9999.0)],
        "grp string, rid long, value double",
    )
    # MAD = 0 (constant majority): by contract the group emits nothing
    assert A.mad_outliers(df, "value", ["grp"]).count() == 0


def test_mad_outliers_approx_agrees_on_clear_spikes(spark):
    rows = [("g", i, float(i % 7)) for i in range(200)] + [("g", 200, 1e6)]
    df = spark.createDataFrame(rows, "grp string, rid long, value double")
    exact = {r["rid"] for r in A.mad_outliers(df, "value", ["grp"]).collect()}
    approx = {
        r["rid"]
        for r in A.mad_outliers(df, "value", ["grp"], approx=True).collect()
    }
    assert 200 in exact and 200 in approx


def test_grouped_ols_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    rows = []
    for g, (m, c) in {"up": (2.5, 10.0), "down": (-0.75, 99.0)}.items():
        xs = rng.uniform(0, 1000, 150)
        ys = m * xs + c + rng.normal(0, 4, 150)
        rows += [(g, float(x), round(float(y), 2)) for x, y in zip(xs, ys)]
    # x is fed fixed-point too (scale 100) to keep the exactness contract
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    got = {
        r["grp"]: r
        for r in A.grouped_ols(
            df, "x", "y", ["grp"], x_scale=100, y_scale=100
        ).collect()
    }
    for g in ("up", "down"):
        xs = np.array([round(x * 100) / 100 for gg, x, _ in rows if gg == g])
        ys = np.array([y for gg, _, y in rows if gg == g])
        m, c = np.polyfit(xs, ys, 1)
        assert got[g]["n"] == 150
        assert abs(got[g]["slope"] - m) < 1e-4
        assert abs(got[g]["intercept"] - c) < 1e-3
        assert 0.9 < got[g]["r2"] <= 1.0


def test_grouped_ols_degenerate_groups(spark):
    rows = (
        [("constx", 5.0, float(v)) for v in (1, 2, 3)]
        + [("consty", float(x), 7.0) for x in (1, 2, 3)]
    )
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    out = {r["grp"]: r for r in A.grouped_ols(df, "x", "y", ["grp"]).collect()}
    assert "constx" not in out            # zero x-variance: no line
    assert out["consty"]["slope"] == 0.0  # flat line, undefined r2
    assert out["consty"]["r2"] is None
