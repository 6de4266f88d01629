"""Curation pipeline: quality gate + fuzzy dedup + scrub/split compose
under the lineage runner, with resume semantics identical to the KG
pipeline's."""

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.plans.curation import run_curation_pipeline

DOCS = [
    # near-dup pair: one must survive dedup
    (0, "the quick brown fox jumps over the lazy dog and runs far away today", "en"),
    (1, "the quick brown fox jumps over the lazy dog and runs far away now", "en"),
    # clean singleton with PII
    (2, "contact me at alice@example.com about the spark engine and query plans", "en"),
    # low quality: few tokens AND all punctuation -> quality 0, dropped
    (3, "!!! ??? ...", "en"),
    # another clean singleton
    (4, "completely different text about window functions and shuffle behavior", "en"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def _stages(res):
    return [(e["stage"], e["action"]) for e in res["_runner"].events]


def test_curation_inline_semantics(spark, docs_df):
    res = run_curation_pipeline(spark, docs_df, workdir=None)
    try:
        cur = {r["doc_id"]: r for r in res["curated"].collect()}
        assert 3 not in cur                       # quality gate
        assert len({0, 1} & set(cur)) == 1        # near-dup collapsed
        assert 2 in cur and 4 in cur
        assert "alice@example.com" not in cur[2]["text"]
        assert cur[2]["n_emails"] == 1
        assert all(r["split"] in ("train", "dev", "test") for r in cur.values())
        assert all(r["quality"] >= 0.3 for r in cur.values())
    finally:
        res["_runner"].unpersist()


def test_curation_resume_and_partial_recompute(spark, docs_df, tmp_path):
    wd = str(tmp_path / "wd")
    r1 = run_curation_pipeline(spark, docs_df, workdir=wd,
                               input_fingerprint="docs:v1")
    n1 = r1["curated"].count()
    assert [a for _, a in _stages(r1)] == ["computed"] * 3

    # full resume: nothing recomputes, counts identical
    r2 = run_curation_pipeline(spark, docs_df, workdir=wd,
                               input_fingerprint="docs:v1")
    assert [a for _, a in _stages(r2)] == ["resumed"] * 3
    assert r2["curated"].count() == n1

    # crash-resume: drop the last stage -> only it recomputes
    import shutil

    shutil.rmtree(f"{wd}/curated")
    r3 = run_curation_pipeline(spark, docs_df, workdir=wd,
                               input_fingerprint="docs:v1")
    assert _stages(r3) == [("filtered", "resumed"), ("keepers", "resumed"),
                           ("curated", "computed")]
    assert r3["curated"].count() == n1

    # changed input fingerprint invalidates everything
    r4 = run_curation_pipeline(spark, docs_df, workdir=wd,
                               input_fingerprint="docs:v2")
    assert [a for _, a in _stages(r4)] == ["computed"] * 3


def test_curation_keeper_join_is_colocated(spark, docs_df, tmp_path):
    """filtered and keepers are bucketed by doc_id: their join in the
    curated stage must run without an Exchange on either side."""
    wd = str(tmp_path / "wd2")
    res = run_curation_pipeline(spark, docs_df, workdir=wd,
                                input_fingerprint="docs:v1")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = res["filtered"].join(
            res["keepers"].where(F.col("keep")).select("doc_id"), "doc_id"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
