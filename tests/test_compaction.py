"""Compaction planner contracts: bounded overflow, contiguity in file
order, oversize isolation, partitioning invariance, corrupt-manifest
row handling, and the one-shuffle plan shape."""

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.operators.compaction import (
    compaction_manifest,
    plan_compaction,
)

TARGET = 100


@pytest.fixture(scope="module")
def manifest(spark):
    rows = []
    for g in ("a", "b"):
        for i in range(200):
            rows.append((g, i, (i * 37) % 60 + 1))  # sizes 1..60
    rows.append(("a", 900, 250))  # oversize: > 2x target
    rows.append(("b", 901, 100))  # exactly target
    rows.append(("a", 902, None))  # corrupt: no size
    rows.append(("b", 903, -5))  # corrupt: negative
    return spark.createDataFrame(rows, "grp string, fid long, sz long")


def _plan(df):
    return plan_compaction(df, ["grp"], "fid", "sz", TARGET)


def test_bounded_overflow(spark, manifest):
    got = _plan(manifest).collect()
    by_bin = {}
    for r in got:
        by_bin.setdefault((r["grp"], r["bin"]), []).append(r["sz"])
    max_sz = max(r["sz"] for r in got)
    for sizes in by_bin.values():
        assert sum(sizes) < TARGET + max_sz


def test_bins_contiguous_in_file_order(spark, manifest):
    got = sorted(_plan(manifest).collect(), key=lambda r: (r["grp"], r["fid"]))
    for g in ("a", "b"):
        bins = [r["bin"] for r in got if r["grp"] == g]
        assert bins == sorted(bins)
        assert bins[0] == 0


def test_oversize_flag_and_isolation(spark, manifest):
    got = _plan(manifest).collect()
    over = [r for r in got if r["oversize"]]
    assert {(r["grp"], r["fid"]) for r in over} == {("a", 900), ("b", 901)}
    # the item AFTER an oversize file starts a fresh bin index: no
    # LATER file ever shares an oversize file's bin (earlier files in
    # the same cumulative span may — that's the bounded-overflow deal)
    for o in over:
        later_sharers = [
            r
            for r in got
            if r["grp"] == o["grp"] and r["bin"] == o["bin"] and r["fid"] > o["fid"]
        ]
        assert later_sharers == []


def test_corrupt_rows_dropped(spark, manifest):
    got = _plan(manifest).collect()
    assert all(r["sz"] is not None and r["sz"] >= 0 for r in got)
    assert len(got) == 402


def test_partitioning_invariance(spark, manifest):
    a = sorted(map(tuple, _plan(manifest.repartition(1)).collect()))
    b = sorted(map(tuple, _plan(manifest.repartition(13, "fid")).collect()))
    assert a == b


def test_manifest_rollup(spark, manifest):
    plan = _plan(manifest)
    roll = compaction_manifest(plan, ["grp"], "sz").collect()
    per_file = plan.collect()
    for r in roll:
        mine = [p for p in per_file if p["grp"] == r["grp"] and p["bin"] == r["bin"]]
        assert r["n_files"] == len(mine)
        assert r["total_bytes"] == sum(p["sz"] for p in mine)
        assert r["has_oversize"] == any(p["oversize"] for p in mine)


def test_invalid_args(spark, manifest):
    with pytest.raises(ValueError):
        plan_compaction(manifest, ["grp"], "fid", "sz", 0)
    with pytest.raises(ValueError):
        plan_compaction(manifest, [], "fid", "sz", TARGET)


def test_single_shuffle_plan(spark, manifest):
    """One hash Exchange on the group key feeds the window sort; no
    Python, no extra shuffle."""
    plan = _plan(manifest)
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in s
    assert s.count("Exchange hashpartitioning") == 1


def test_exact_past_float_precision(spark):
    """Integer DIV, not float division: sizes near 2^53 where doubles
    would round, bin ids must still be exact."""
    big = 1 << 53
    rows = [("g", i, big + i) for i in range(4)]
    df = spark.createDataFrame(rows, "grp string, fid long, sz long")
    got = {r["fid"]: r["bin"] for r in plan_compaction(df, ["grp"], "fid", "sz", big + 10).collect()}
    # exclusive cumsums: 0, 2^53, 2^54+1, 3*2^53+3 -> DIV (2^53+10)
    t = big + 10
    assert got == {0: 0, 1: big // t, 2: (2 * big + 1) // t, 3: (3 * big + 3) // t}
