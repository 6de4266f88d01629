"""Multimodal span processing: images/audio/video as opaque binary.

The corpus's media spans (kind != 'text', media_ref set — BASELINE.json
input_hint) carry payloads as opaque ``binary`` columns with typed
metadata. This module is the Spark-side plumbing for decode /
feature-extract / resize / frame-sample:

  * schemas are real and enforced,
  * the pipeline shape is real (mapInPandas over doc_id-partitioned
    Arrow batches; one JVM→Python crossing; metadata stays JVM-side),
  * the codec itself is STUBBED — image/audio libraries are not in this
    container. ``decode=fake`` produces a deterministic payload-hash
    "decode" (so tests assert real plumbing end-to-end);
    ``decode=real`` raises NotImplementedError at the exact seam where
    PIL/torchaudio would slot in.

At 100 TB the binary column dominates bytes: every op here projects
(doc_id, span_idx, media_ref, payload) ONLY — nested-schema pruning
keeps spans.text out of the scan — and feature outputs are narrow
(array<float>), so shuffles never carry payload bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING, Literal

from pyspark.sql import DataFrame, functions as F, types as T

if TYPE_CHECKING:
    import pandas as pd

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FEATURE_DIM = 16


def media_spans(documents: DataFrame) -> DataFrame:
    """documents -> one row per media span. Only kind/media_ref/offset are
    read (nested pruning drops spans.text from the parquet scan)."""
    # explicit nested narrowing via arrays_zip (no spans.text in the
    # scan) — see operators/ner.explode_text_spans for the rationale
    narrowed = F.arrays_zip(
        F.col("spans.kind").alias("kind"), F.col("spans.media_ref").alias("media_ref")
    )
    return (
        documents.select("doc_id", F.posexplode(narrowed).alias("span_idx", "span"))
        .where(F.col("span.kind") != "text")
        .select(
            "doc_id",
            F.col("span_idx").cast("int").alias("span_idx"),
            F.col("span.kind").alias("kind"),
            F.col("span.media_ref").alias("media_ref"),
        )
    )


def fetch_payload(spans: DataFrame) -> DataFrame:
    """Resolve media_ref -> payload bytes.

    In production this is an object-store read (Iceberg positional ref or
    a bulk GET through a connector); here the payload is the ref's bytes
    — deterministic stand-in keeping column types honest (binary)."""
    return spans.withColumn("payload", F.encode("media_ref", "UTF-8").cast("binary"))


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in decode: md5(payload) drives pseudo-geometry
    + a FEATURE_DIM-float feature. Replaced wholesale by PIL/ffmpeg in
    production; signature is the contract."""
    d = hashlib.md5(payload).digest()
    width = 16 + d[0]
    height = 16 + d[1]
    n_frames = 1 if kind == "image" else 1 + d[2] % 32
    feat = [(d[i % 16] / 255.0) for i in range(FEATURE_DIM)]
    return width, height, n_frames, feat


def _real_decode(payload: bytes, kind: str) -> tuple[int, int, int, list[float]]:
    """Actual image decode via PIL (trial-imported by the caller).

    Feature = the grayscale image resampled to a 1×FEATURE_DIM strip,
    normalized to [0, 1] — a deterministic, library-portable stand-in
    for a learned embedding. Audio/video stay behind the stub seam
    (pyav/torchaudio are a separate optional dependency)."""
    if kind != "image":
        raise NotImplementedError(
            "real audio/video decode needs pyav/torchaudio (optional deps)"
        )
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    width, height = img.size
    strip = img.convert("L").resize((FEATURE_DIM, 1))
    feat = [p / 255.0 for p in strip.getdata()]
    return width, height, 1, feat


def extract_media_features(
    documents: DataFrame,
    decode: Literal["fake", "real"] = "fake",
    fetcher=fetch_payload,
) -> DataFrame:
    """Media pipeline: explode → fetch → mapInPandas(decode+featurize).

    Arrow batches keep payloads off the driver; the Python worker sees
    pandas columns of bytes. decode='real' trial-imports PIL on the
    worker and decodes actual image bytes (geometry + grayscale-strip
    feature); when PIL is absent it raises at the exact seam where the
    codec would slot in. ``fetcher`` resolves media_ref → payload bytes
    (object-store read in production; injectable for tests that supply
    real image payloads).
    """
    spans = fetcher(media_spans(documents))

    def featurize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if decode == "real":
            try:
                import PIL  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "real media decode needs PIL/torchaudio/pyav (not in "
                    "this container); decode='fake' exercises the full "
                    "Spark plumbing"
                ) from exc
        decoder = _real_decode if decode == "real" else _fake_decode
        for pdf in batches:
            if pdf.empty:
                continue
            geo = [
                decoder(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_idx": pdf["span_idx"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "width": [g[0] for g in geo],
                    "height": [g[1] for g in geo],
                    "n_frames": [g[2] for g in geo],
                    "feature": [g[3] for g in geo],
                }
            )

    return spans.mapInPandas(featurize, schema=MEDIA_FEATURES)


def resize_geometry(features: DataFrame, max_side: int = 224) -> DataFrame:
    """Aspect-preserving resize targets: the geometry half of a
    thumbnail/resize stage, as pure column algebra.

    Computes (out_width, out_height, scale) such that the longer side
    fits ``max_side`` and media smaller than the target is NEVER
    upscaled (scale capped at 1.0) — the standard training-data
    convention. The pixel resample itself lives behind the same stub
    seam as decode (PIL's ``Image.resize`` / ffmpeg scale filter slot in
    at extract_media_features' decode='real'); keeping the geometry in
    JVM expressions means the planner prunes media whose size already
    complies before any payload is decoded.
    """
    longer = F.greatest("width", "height").cast("double")
    scale = F.least(F.lit(1.0), F.lit(float(max_side)) / longer)
    return features.select(
        "doc_id",
        "span_idx",
        "media_ref",
        "kind",
        "width",
        "height",
        F.round(scale, 6).alias("scale"),
        F.greatest(F.lit(1), F.round(F.col("width") * scale).cast("int")).alias("out_width"),
        F.greatest(F.lit(1), F.round(F.col("height") * scale).cast("int")).alias("out_height"),
    )


def frame_sample_plan(features: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling metadata: which frame indices a video decode would
    materialize. Pure column algebra over n_frames (the decode itself is
    behind the stub seam)."""
    return features.where(F.col("kind") != "image").select(
        "doc_id",
        "span_idx",
        "media_ref",
        F.filter(
            F.sequence(F.lit(0), F.col("n_frames") - 1),
            lambda i: i % every_n == 0,
        ).alias("sampled_frames"),
    )


def align_text_to_media(spans: DataFrame) -> DataFrame:
    """Associate every TEXT span with the media span it illustrates —
    the nearest media anchor at or before it in document order.

    Input: one row per span, ``(doc_id, span_idx, kind, media_ref,
    offset)`` (the exploded form of the interleaved corpus — see
    ``media_spans``/``explode_text_spans``; reference analogue: the
    interleaved span sequence the per-request API receives as one
    document). Output: the text spans with

      * ``anchor_ref``    — media_ref of the last media span whose
                            offset <= the text span's offset
                            (NULL when no media precedes it),
      * ``anchor_offset`` — that anchor's offset (NULL likewise),
      * ``anchor_dist``   — offset distance to the anchor.

    This is the document-internal as-of join that turns "mention at
    character 2041" into "mention under figure media://d/3" — the step
    a multimodal KG needs before it can emit (entity, depicted_in,
    media_ref) triples.

    Shape: the union-of-streams as-of pattern of
    ``operators/analytics.py::asof_join`` degenerates to a SINGLE
    last-non-null running window here because both "streams" already
    live in one table — so: ONE shuffle (hash on doc_id), one in-window
    pass, zero Python, no join at all. Ties (media and text at the same
    offset) anchor the text to that media span: media sorts before text
    at equal offset.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("doc_id")
        .orderBy(
            F.col("offset").asc(),
            # media first at equal offset so same-offset text anchors to it
            F.when(F.col("kind") == "text", 1).otherwise(0).asc(),
            F.col("span_idx").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_media = F.col("kind") != "text"
    # ONE struct-valued window, not two parallel ones: a media span with
    # a NULL media_ref must still BE the anchor (its ref is simply
    # unknown) — two independent last(ignorenulls) windows would skip it
    # in the ref window but not the offset window and stitch together a
    # (ref, offset) pair from two different media spans.
    anchor = F.last(
        F.when(
            is_media,
            F.struct(F.col("media_ref").alias("ref"), F.col("offset").alias("off")),
        ),
        ignorenulls=True,
    ).over(w)
    anchored = spans.select(
        "doc_id", "span_idx", "kind", "offset", anchor.alias("_a")
    )
    return anchored.where(F.col("kind") == "text").select(
        "doc_id",
        "span_idx",
        "offset",
        F.col("_a.ref").alias("anchor_ref"),
        F.col("_a.off").alias("anchor_offset"),
        (F.col("offset") - F.col("_a.off")).alias("anchor_dist"),
    )
