"""Structured Streaming tests: the shared extraction operator running
incrementally (exactly-once over file backlog) and event-time windows
with watermark."""

import os

from pyspark.sql import functions as F

from pg_iui_ner_api_spark import synth
from pg_iui_ner_api_spark.operators import ner as N
from pg_iui_ner_api_spark.streaming import jobs as J


def test_stream_extract_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "mentions")
    ckpt = str(tmp_path / "ckpt")
    # two separate file drops = two incremental chunks
    synth.synth_documents(spark, 40, partitions=2).write.mode("append").parquet(in_dir)
    docs2 = synth.synth_documents(spark, 80, partitions=2).where(
        F.col("doc_id") >= "doc0000000040"
    )
    docs2.write.mode("append").parquet(in_dir)

    q = J.stream_extract_mentions(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)

    # start/end are span-local offsets, so the key must include span_idx
    got = {
        (r["doc_id"], r["span_idx"], r["start"], r["end"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["doc_id"], r["span_idx"], r["start"], r["end"])
        for r in N.mentions_of(N.extract(spark.read.parquet(in_dir))).collect()
    }
    assert got == want and len(got) > 0

    # restart with same checkpoint: nothing new to process, no dup rows
    q2 = J.stream_extract_mentions(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(out_dir).count() == len(want)


def test_windowed_event_counts_match_batch(spark, tmp_path, sf_dir):
    in_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "counts")
    ckpt = str(tmp_path / "ckpt2")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.write.parquet(in_dir)

    q = J.run_windowed_event_counts(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)

    got = {
        (str(r["w_start"]), r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # batch oracle, restricted to windows the watermark has closed
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    closed = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("w_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .where(F.col("w_start") + F.expr("INTERVAL 3 HOURS") <= F.lit(max_ts))
    )
    want = {
        (str(r["w_start"]), r["event_type"]): (r["n"], r["sum_value"])
        for r in closed.collect()
    }
    assert want  # sanity: some windows must have closed
    for k, v in want.items():
        assert got.get(k) == v, k
