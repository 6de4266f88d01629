"""Multimodal plumbing tests: media span explode, payload fetch, the
stubbed decode/featurize mapInPandas, and frame sampling."""

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark import synth
from pg_iui_ner_api_spark.operators import media as M

N_DOCS = 120


@pytest.fixture(scope="module")
def docs(spark):
    return synth.synth_documents(spark, N_DOCS, partitions=4).cache()


def test_media_spans_only_non_text(spark, docs):
    ms = M.media_spans(docs).collect()
    assert len(ms) > 0
    assert all(r["kind"] in ("image", "audio") for r in ms)
    assert all(r["media_ref"] for r in ms)


def test_features_deterministic_and_typed(spark, docs):
    feats = M.extract_media_features(docs)
    rows1 = {r["media_ref"]: r for r in feats.collect()}
    rows2 = {r["media_ref"]: r for r in M.extract_media_features(docs).collect()}
    assert rows1.keys() == rows2.keys()
    for ref, r in rows1.items():
        assert r["width"] >= 16 and r["height"] >= 16
        assert len(r["feature"]) == M.FEATURE_DIM
        assert rows2[ref]["feature"] == r["feature"]  # deterministic decode
        if r["kind"] == "image":
            assert r["n_frames"] == 1
        else:
            assert 1 <= r["n_frames"] <= 32


def test_real_decode_raises_at_seam(spark, docs):
    with pytest.raises(Exception) as ei:
        M.extract_media_features(docs, decode="real").collect()
    assert "NotImplementedError" in str(ei.value) or "decode" in str(ei.value)


def test_frame_sampling(spark, docs):
    feats = M.extract_media_features(docs)
    plan = M.frame_sample_plan(feats, every_n=8)
    for r in plan.collect():
        assert r["sampled_frames"][0] == 0
        assert all(i % 8 == 0 for i in r["sampled_frames"])


def test_media_count_matches_span_kinds(spark, docs):
    n_media = docs.select(
        F.explode("spans").alias("s")
    ).where(F.col("s.kind") != "text").count()
    assert M.extract_media_features(docs).count() == n_media


def test_resize_geometry_aspect_and_no_upscale(spark, docs):
    feats = M.extract_media_features(docs)
    rows = M.resize_geometry(feats, max_side=64).collect()
    assert rows
    for r in rows:
        longer = max(r["width"], r["height"])
        if longer <= 64:
            # never upscale
            assert r["scale"] == 1.0
            assert (r["out_width"], r["out_height"]) == (r["width"], r["height"])
        else:
            assert max(r["out_width"], r["out_height"]) == 64
            # aspect preserved within the +-0.5px rounding of each side
            rel = abs(r["out_width"] / r["out_height"] / (r["width"] / r["height"]) - 1)
            assert rel <= 0.5 / r["out_width"] + 0.5 / r["out_height"] + 1e-9, r
        assert r["out_width"] >= 1 and r["out_height"] >= 1
