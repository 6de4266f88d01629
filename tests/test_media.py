"""Multimodal plumbing tests: media span explode, payload fetch, the
stubbed decode/featurize mapInPandas, and frame sampling."""

import importlib.util

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark import synth
from pg_iui_ner_api_spark.operators import media as M

N_DOCS = 120

HAVE_PIL = importlib.util.find_spec("PIL") is not None


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


@pytest.mark.skipif(HAVE_PIL, reason="PIL present: decode='real' decodes")
def test_real_decode_raises_at_seam(spark, docs):
    with pytest.raises(Exception) as ei:
        M.extract_media_features(docs, decode="real").collect()
    assert "NotImplementedError" in str(ei.value) or "decode" in str(ei.value)


def _ppm(width: int, height: int, shade: int) -> bytes:
    """Binary PPM (P6) — pure-Python image bytes PIL can decode."""
    return f"P6 {width} {height} 255\n".encode() + bytes(
        [shade] * (width * height * 3)
    )


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed in this container")
def test_real_decode_with_pil(spark):
    """decode='real' decodes actual pixels: geometry matches the encoded
    image and resize_geometry operates on true dimensions (VERDICT r2 #8)."""
    sizes = {"media://d0/0": (640, 480, 30), "media://d1/0": (100, 50, 200)}
    docs = spark.createDataFrame(
        [
            (ref.split("/")[2], [{"kind": "image", "text": None,
                                  "media_ref": ref, "offset": 0}])
            for ref in sizes
        ],
        schema="doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    payloads = spark.createDataFrame(
        [(ref, _ppm(w, h, s)) for ref, (w, h, s) in sizes.items()],
        schema="media_ref string, payload binary",
    )

    def fetcher(spans):
        return spans.join(F.broadcast(payloads), "media_ref")

    feats = M.extract_media_features(docs, decode="real", fetcher=fetcher)
    rows = {r["media_ref"]: r for r in feats.collect()}
    assert set(rows) == set(sizes)
    for ref, (w, h, shade) in sizes.items():
        r = rows[ref]
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, 1)
        assert len(r["feature"]) == M.FEATURE_DIM
        # uniform-shade image -> every strip sample is shade/255
        assert all(abs(v - shade / 255.0) < 1e-6 for v in r["feature"])
    geo = {r["media_ref"]: r for r in M.resize_geometry(feats, max_side=224).collect()}
    assert (geo["media://d0/0"]["out_width"], geo["media://d0/0"]["out_height"]) == (224, 168)
    assert geo["media://d1/0"]["scale"] == 1.0  # never upscale


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


# ---------------------------------------------------------------------------
# text-to-media as-of alignment
# ---------------------------------------------------------------------------
def _spans_df(spark, rows):
    return spark.createDataFrame(
        rows, schema=["doc_id", "span_idx", "kind", "media_ref", "offset"]
    )


def test_align_text_to_media(spark):
    rows = [
        # doc a: text BEFORE any media at the same offset still anchors
        # to that media (media sorts first at equal offset)
        ("a", 0, "text", None, 5),
        ("a", 1, "image", "m1", 5),
        ("a", 2, "text", None, 7),
        ("a", 3, "video", "m2", 9),
        ("a", 4, "text", None, 9),
        # doc b: no media at all -> NULL anchors
        ("b", 0, "text", None, 0),
        ("b", 1, "text", None, 3),
        # doc c: two media at the SAME offset -> the later span_idx wins
        ("c", 0, "image", "x1", 3),
        ("c", 1, "audio", "x2", 3),
        ("c", 2, "text", None, 4),
    ]
    got = {
        (r["doc_id"], r["span_idx"]): (r["anchor_ref"], r["anchor_offset"], r["anchor_dist"])
        for r in M.align_text_to_media(_spans_df(spark, rows)).collect()
    }
    assert got == {
        ("a", 0): ("m1", 5, 0),
        ("a", 2): ("m1", 5, 2),
        ("a", 4): ("m2", 9, 0),
        ("b", 0): (None, None, None),
        ("b", 1): (None, None, None),
        ("c", 2): ("x2", 3, 1),
    }


def test_align_text_to_media_single_shuffle_no_python(spark):
    rows = [("a", 0, "text", None, 5), ("a", 1, "image", "m1", 5)]
    plan = (
        M.align_text_to_media(_spans_df(spark, rows))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # ONE hash shuffle on doc_id
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_align_text_to_media_null_ref_anchor_stays_consistent(spark):
    """A media span with a NULL media_ref is still the nearest anchor
    (unknown ref, its own offset) — the ref and offset must come from
    the SAME span, never stitched from two different media spans."""
    rows = [
        ("a", 0, "image", "m1", 0),
        ("a", 1, "image", None, 5),   # anchor with unknown ref
        ("a", 2, "text", None, 9),
    ]
    got = M.align_text_to_media(_spans_df(spark, rows)).collect()[0]
    assert (got["anchor_ref"], got["anchor_offset"], got["anchor_dist"]) == (
        None, 5, 4,
    )


def test_frame_sample_plan(spark, docs):
    """Every 8th frame index, images excluded, n_frames=1 -> [0], and
    the plan stays pure column algebra (no Python beyond the feature
    UDF upstream)."""
    feats = M.extract_media_features(docs)
    plan = M.frame_sample_plan(feats, every_n=8)
    got = {(r["doc_id"], r["span_idx"]): r["sampled_frames"] for r in plan.collect()}
    ref = {
        (r["doc_id"], r["span_idx"]): r["n_frames"]
        for r in feats.collect()
        if r["kind"] != "image"
    }
    assert set(got) == set(ref)
    for k, frames in got.items():
        assert frames == list(range(0, ref[k], 8))
        assert frames[0] == 0  # a decode always materializes frame 0
