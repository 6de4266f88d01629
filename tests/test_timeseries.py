"""interpolate_linear + rolling_range_stats: hand-built series, brute
force python references, frame-exclusion semantics, plan shape."""

import datetime as dt
import math
import statistics

import pytest

from pg_iui_ner_api_spark.operators.analytics import (
    interpolate_linear,
    rolling_range_stats,
)


def _ts(sec):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def series(spark):
    # user "a": observations at bins 0, 3, 4, 7 (bin = 10s)  -> gaps 1-2, 5-6
    # user "b": single observation -> single-bin span, nothing to fill
    rows = [
        (1, _ts(5), "a", 10.0),
        (2, _ts(35), "a", 40.0),
        (3, _ts(45), "a", 20.0),
        (4, _ts(75), "a", 80.0),
        (5, _ts(12), "b", 7.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, value double"
    )


def test_interpolation_formula(spark, series):
    got = {
        (r["key"], r["bin"]): (r["value"], r["interpolated"])
        for r in interpolate_linear(series, 10, key_col="user_id").collect()
    }
    base = int(_ts(0).timestamp()) // 10
    a = {b - base: v for (k, b), v in got.items() if k == "a"}
    # observed bins keep their exact values, flagged as real
    assert a[0] == (10.0, False)
    assert a[3] == (40.0, False)
    assert a[4] == (20.0, False)
    assert a[7] == (80.0, False)
    # interior gaps interpolate linearly between the two neighbors
    assert a[1] == (pytest.approx(20.0), True)  # 10 + (40-10)*1/3
    assert a[2] == (pytest.approx(30.0), True)
    assert a[5] == (pytest.approx(40.0), True)  # 20 + (80-20)*1/3
    assert a[6] == (pytest.approx(60.0), True)
    # full grid, nothing outside the observed span
    assert set(a) == set(range(8))
    b = [(k, bn) for (k, bn) in got if k == "b"]
    assert len(b) == 1  # single-bin span


def test_interpolate_partitioning_invariance(spark, series):
    one = sorted(map(tuple, interpolate_linear(series.repartition(1), 10, key_col="user_id").collect()))
    many = sorted(map(tuple, interpolate_linear(series.repartition(7, "event_id"), 10, key_col="user_id").collect()))
    assert one == many


@pytest.fixture(scope="module")
def events(spark):
    rows = []
    for i in range(120):
        u = "u%d" % (i % 3)
        sec = (i * 97) % 7200  # irregular spacing over 2h
        rows.append((i, _ts(sec), u, float((i * 13) % 50)))
    # two events on the SAME second for the peer-exclusion check
    rows.append((500, _ts(100), "u0", 1.0))
    rows.append((501, _ts(100), "u0", 2.0))
    return rows, spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, value double"
    )


def test_rolling_stats_brute_force(spark, events):
    rows, df = events
    got = {r["event_id"]: r for r in rolling_range_stats(df, 3600).collect()}
    sec_of = {e: int(t.timestamp()) for e, t, _, _ in rows}
    for eid, ts, u, v in rows:
        s = sec_of[eid]
        window = [
            val
            for e2, t2, u2, val in rows
            if u2 == u and s - 3600 <= sec_of[e2] <= s - 1
        ]
        r = got[eid]
        assert r["n_prev"] == len(window)
        if window:
            assert r["mean_prev"] == pytest.approx(
                round(sum(window) / len(window), 6), abs=1e-6
            )
        else:
            assert r["mean_prev"] is None
        if len(window) >= 2:
            sd = statistics.stdev(window)
            assert r["std_prev"] == pytest.approx(round(sd, 6), abs=1e-6)
            if sd > 0:
                assert r["zscore"] == pytest.approx(
                    round((v - sum(window) / len(window)) / sd, 6), abs=1e-5
                )
        else:
            assert r["std_prev"] is None and r["zscore"] is None


def test_rolling_excludes_same_second_peers(spark, events):
    _, df = events
    got = {r["event_id"]: r for r in rolling_range_stats(df, 3600).collect()}
    # 500 and 501 share second 100: neither sees the other
    rows, _ = events
    sec_of = {e: int(t.timestamp()) for e, t, _, _ in rows}
    s = sec_of[500]
    base = [
        val
        for e2, t2, u2, val in rows
        if u2 == "u0" and s - 3600 <= sec_of[e2] <= s - 1
    ]
    assert got[500]["n_prev"] == len(base) == got[501]["n_prev"]


def test_plans_jvm_only(spark, series, events):
    _, df = events
    for out in (
        interpolate_linear(series, 10, key_col="user_id"),
        rolling_range_stats(df, 3600),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan


def test_cohort_retention(spark):
    from pg_iui_ner_api_spark.operators.analytics import cohort_retention

    rows = []
    # users 1,2 start day 0; user 1 returns day 1 and 3; user 2 never;
    # user 3 starts day 1, returns day 2; null-ts row dropped
    for eid, (u, day) in enumerate(
        [(1, 0), (2, 0), (1, 1), (1, 3), (3, 1), (3, 2), (1, 0)]
    ):
        rows.append((eid, _ts(day * 86400 + 5), u, 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    df = df.unionByName(
        spark.createDataFrame(
            [(99, None, 1, 1.0)],
            "event_id long, ts timestamp, user_id long, value double",
        )
    )
    got = {
        (r["cohort"], r["offset_bins"]): r["n_keys"]
        for r in cohort_retention(df, 86400).collect()
    }
    base = int(_ts(0).timestamp()) // 86400
    rel = {(c - base, o): n for (c, o), n in got.items()}
    assert rel == {
        (0, 0): 2,  # users 1,2 (dup same-day rows collapse)
        (0, 1): 1,  # user 1
        (0, 3): 1,  # user 1
        (1, 0): 1,  # user 3
        (1, 1): 1,  # user 3
    }
