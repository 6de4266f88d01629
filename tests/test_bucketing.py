"""Bucketed-table co-located joins: the write-side answer to repeated
big-big joins at corpus scale (prompt: 'repartition()/bucketing for
co-located joins')."""

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.plans.bucketing import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    a = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("va")
    )
    b = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("vb")
    )
    write_bucketed(a, "bk_a", "k", n_buckets=8)
    write_bucketed(b, "bk_b", "k", n_buckets=8)
    yield "bk_a", "bk_b"
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    """Big-big shape: with broadcast off (as it would be for two large
    tables), the co-bucketed sort-merge join needs NO Exchange and NO
    Sort on either side — buckets are read co-located and pre-sorted."""
    ta, tb = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, ta).join(read_bucketed(spark, tb), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_results_match_plain_join(spark, bucketed_pair):
    ta, tb = bucketed_pair
    got = {(r["k"], r["va"], r["vb"])
           for r in read_bucketed(spark, ta).join(read_bucketed(spark, tb), "k").collect()}
    want = {(i, i * 3, i * 7) for i in range(2000)}
    assert got == want
