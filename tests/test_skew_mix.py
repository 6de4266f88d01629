"""salted_join result-equality/skew-spread contracts and
temperature_mix distribution/determinism contracts."""

import math

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.operators.packing import temperature_mix
from pg_iui_ner_api_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key 0 holds 80% of the fact side
    fact = spark.createDataFrame(
        [(0 if i % 5 != 4 else i % 37, i, float(i % 11)) for i in range(2000)],
        "k long, fid long, v double",
    )
    dim = spark.createDataFrame(
        [(i, "d%d" % i) for i in range(37)], "k long, label string"
    )
    return fact, dim


def test_salted_equals_plain_inner(spark, skewed):
    fact, dim = skewed
    got = sorted(map(tuple, salted_join(fact, dim, ["k"], salt=8, disambig="fid").collect()))
    want = sorted(map(tuple, fact.join(dim, "k").collect()))
    assert got == want and len(got) == 2000


def test_salted_left_join_null_extension(spark, skewed):
    fact, _ = skewed
    dim = spark.createDataFrame([(0, "only-hot")], "k long, label string")
    got = salted_join(fact, dim, ["k"], salt=4, disambig="fid", how="left")
    rows = got.collect()
    assert len(rows) == 2000  # exactly one output row per left row
    n_unmatched = fact.where(F.col("k") != 0).count()
    assert n_unmatched > 0
    assert sum(1 for r in rows if r["label"] is None) == n_unmatched


def test_salt_actually_spreads_hot_key(spark, skewed):
    """The hot key's rows must land on >1 salt sub-key — the whole
    point. Measured on the internal salting expression."""
    fact, _ = skewed
    salted = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col("fid"), F.lit("salt")), F.lit(8)).cast("int"),
    )
    spread = (
        salted.where(F.col("k") == 0).select("_salt").distinct().count()
    )
    assert spread == 8


def test_salted_join_plan_keys_include_salt(spark, skewed):
    fact, dim = skewed
    out = salted_join(fact, dim, ["k"], salt=8, disambig="fid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
    assert "Python" not in plan


def test_salted_invalid_args(spark, skewed):
    fact, dim = skewed
    for bad in (dict(salt=0), dict(how="full"), dict()):
        with pytest.raises(ValueError):
            if bad.get("how"):
                salted_join(fact, dim, ["k"], how=bad["how"])
            elif "salt" in bad:
                salted_join(fact, dim, ["k"], salt=bad["salt"])
            else:
                salted_join(fact, dim, [])


@pytest.fixture(scope="module")
def sources(spark):
    rows = []
    for i in range(900):
        rows.append((i, "big"))
    for i in range(900, 1000):
        rows.append((i, "small"))
    rows.append((1000, None))
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mix_fractions_and_flags(spark, sources):
    got = temperature_mix(sources, alpha=0.5).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r)
    assert len(got) == 1001
    # smallest source keeps frac exactly 1.0; big trims to sqrt ratio
    assert all(r["keep_frac"] == 1.0 for r in by_src["small"])
    assert all(r["keep"] for r in by_src["small"])
    want_big = math.sqrt(100) / math.sqrt(900)
    assert all(r["keep_frac"] == pytest.approx(want_big) for r in by_src["big"])
    kept_big = sum(1 for r in by_src["big"] if r["keep"])
    # expectation 300; md5 uniform over 900 docs: allow 4-sigma
    assert abs(kept_big - 300) < 4 * math.sqrt(900 * (1 / 3) * (2 / 3))
    # null source: never kept, no fraction
    nulls = by_src[None]
    assert len(nulls) == 1 and nulls[0]["keep"] is False
    assert nulls[0]["keep_frac"] is None


def test_mix_deterministic_and_append_stable(spark, sources):
    a = {r["doc_id"]: r["keep"] for r in temperature_mix(sources, alpha=0.5).collect()}
    b = {
        r["doc_id"]: r["keep"]
        for r in temperature_mix(sources.repartition(7), alpha=0.5).collect()
    }
    assert a == b
    # alpha=1 keeps everything with a source
    c = temperature_mix(sources, alpha=1.0).collect()
    assert all(r["keep"] == (r["source"] is not None) for r in c)


def test_mix_alpha_zero_equalizes(spark, sources):
    got = temperature_mix(sources, alpha=0.0).collect()
    fr = {r["source"]: r["keep_frac"] for r in got if r["source"]}
    # alpha=0: frac_s = (1/n_s) / (1/n_min) = n_min / n_s
    assert fr["small"] == pytest.approx(1.0)
    assert fr["big"] == pytest.approx(100 / 900)
    with pytest.raises(ValueError):
        temperature_mix(sources, alpha=1.5)


def test_mix_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, source string")
    got = temperature_mix(empty)
    assert got.count() == 0
    assert "keep" in got.columns and "keep_frac" in got.columns
