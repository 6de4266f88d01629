"""Z-order layout: Morton key exactness and pruning-relevant locality."""

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.operators import layout as L


def _py_morton(x, y):
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_bit_interleave(spark):
    pts = [(0, 0), (1, 0), (0, 1), (1, 1), (7, 5), (255, 255),
           (65535, 0), (0, 65535), (65535, 65535), (12345, 54321),
           (65536 + 3, 2)]  # >16 bits: low 16 clamp
    df = spark.createDataFrame(pts, schema=["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", L.zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _py_morton(x & 0xFFFF, y & 0xFFFF), (x, y)


def test_zorder_layout_partitions_cover_compact_rects(spark):
    # a 32x32 grid z-ordered into 8 range partitions: every partition's
    # (x, y) bounding box must cover far less area than the full grid —
    # the property that makes min/max pruning work on BOTH dimensions
    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, schema=["x", "y"])
    laid = L.zorder_layout(df, "x", "y", partitions=8)
    parts = laid.withColumn("pid", F.spark_partition_id()).groupBy("pid").agg(
        F.min("x").alias("x0"), F.max("x").alias("x1"),
        F.min("y").alias("y0"), F.max("y").alias("y1"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    assert sum(r["n"] for r in parts) == 1024
    total_area = 32 * 32
    for r in parts:
        area = (r["x1"] - r["x0"] + 1) * (r["y1"] - r["y0"] + 1)
        assert area <= total_area / 2, dict(r.asDict())


def test_zorder_key_stays_jvm(spark):
    df = spark.createDataFrame([(1, 2)], schema=["x", "y"])
    plan = (
        df.select(L.zorder_key(F.col("x"), F.col("y")).alias("z"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
