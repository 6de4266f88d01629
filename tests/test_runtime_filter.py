"""Bloom runtime-filter semi-join: exactness vs a plain semi-join,
false-positive-rate bound, degenerate inputs, and the plan property
that the bloom predicate filters the fact side BEFORE the join."""

import math

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.operators import runtime_filter as RF

M_BITS = 1 << 14
K = 5


@pytest.fixture(scope="module")
def tables(spark):
    fact = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    # every 50th key, shifted: 2% selectivity
    keys = spark.range(0, 5000, 50).select((F.col("id") + 3).alias("kk"))
    return fact, keys


def test_bloom_semi_join_is_exact(spark, tables):
    fact, keys = tables
    got = sorted(
        r["k"]
        for r in RF.bloom_semi_join(fact, keys, "k", "kk", M_BITS, K).collect()
    )
    want = sorted(
        r["k"]
        for r in fact.join(
            keys.select(F.col("kk").alias("k")), "k", "left_semi"
        ).collect()
    )
    assert got == want and len(got) == 100


def test_bloom_never_false_negative(spark, tables):
    fact, keys = tables
    bm = RF.bloom_build(keys, "kk", M_BITS, K)
    passed = {
        r["k"]
        for r in RF.bloom_candidates(fact, bm, "k", M_BITS, K).collect()
    }
    member = {r["kk"] for r in keys.collect()}
    assert member & set(range(5000)) <= passed


def test_false_positive_rate_within_theory(spark, tables):
    fact, keys = tables
    n_keys = keys.count()
    bm = RF.bloom_build(keys, "kk", M_BITS, K)
    n_pass = RF.bloom_candidates(fact, bm, "k", M_BITS, K).count()
    true_hits = 100
    fp = n_pass - true_hits
    # theoretical fpp with 3x slack (n=100 keys in 2^14 bits => ~1e-9;
    # use a generous absolute floor so the test is not flaky-by-design)
    fpp_theory = (1.0 - math.exp(-K * n_keys / M_BITS)) ** K
    assert fp <= max(5, 3 * fpp_theory * 5000)


def test_bitmap_is_fixed_size_and_mergeable_shape(spark, tables):
    _, keys = tables
    bm = RF.bloom_build(keys, "kk", M_BITS, K)
    assert len(bm) == M_BITS // 64
    # OR of two disjoint builds == build of the union (mergeability)
    a = keys.where(F.col("kk") < 2500)
    b = keys.where(F.col("kk") >= 2500)
    bma = RF.bloom_build(a, "kk", M_BITS, K)
    bmb = RF.bloom_build(b, "kk", M_BITS, K)
    assert [x | y for x, y in zip(bma, bmb)] == bm


def test_empty_key_side(spark, tables):
    fact, keys = tables
    empty = keys.where(F.lit(False))
    assert RF.bloom_semi_join(fact, empty, "k", "kk", M_BITS, K).count() == 0


def test_null_fact_keys_never_match(spark):
    fact = spark.createDataFrame(
        [(None,), (1,), (2,)], "k bigint"
    )
    keys = spark.createDataFrame([(1,)], "kk bigint")
    got = [r["k"] for r in RF.bloom_semi_join(fact, keys, "k", "kk", M_BITS, K).collect()]
    assert got == [1]


def test_invalid_params_rejected(spark, tables):
    _, keys = tables
    with pytest.raises(ValueError):
        RF.bloom_build(keys, "kk", 100, K)  # not a multiple of 64
    with pytest.raises(ValueError):
        RF.bloom_build(keys, "kk", M_BITS, 0)


def test_bloom_filter_applies_before_semi_join(spark, tables):
    """Plan pin: the getbit membership predicate must sit on the fact
    side BELOW the left-semi join (map-side, pre-Exchange), so at scale
    the shuffle carries only bloom survivors."""
    fact, keys = tables
    out = RF.bloom_semi_join(fact, keys, "k", "kk", M_BITS, K)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "getbit" in plan
    # the membership test is plain Column algebra: no Python workers
    assert "Python" not in plan
    lines = plan.splitlines()
    semi_at = min(i for i, l in enumerate(lines) if "LeftSemi" in l)
    getbit_at = min(i for i, l in enumerate(lines) if "getbit" in l)
    # explain prints parents above children: the bloom condition appears
    # below (after) the semi join it feeds
    assert getbit_at > semi_at
