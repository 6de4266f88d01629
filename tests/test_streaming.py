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


def test_stream_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionizer: a session closes when a later
    event exceeds the gap; state survives across separate availableNow
    runs through the streaming checkpoint."""
    import datetime as dt

    import pandas as pd

    indir = str(tmp_path / "ev_in")
    outdir = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")
    os.makedirs(indir, exist_ok=True)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")

    def write_batch(name, rows):
        # the file stream source lists files in the root (no recursion):
        # append a new part file per batch
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(indir)

    # batch 1: user 7 has two events 100 s apart (one open session)
    write_batch("b1", [
        (1, t0, 7, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(seconds=100), 7, "click", 1.0, "{}"),
    ])
    q = J.run_stream_sessionize(spark, indir, outdir, ckpt, gap_seconds=1800)
    q.awaitTermination(120)
    # nothing closed yet (session still open in state)
    got1 = spark.read.schema(J.SESSION_OUT).parquet(outdir)
    assert got1.count() == 0

    # batch 2, separate run: an event 5000 s later closes session 0
    write_batch("b2", [
        (3, t0 + dt.timedelta(seconds=5100), 7, "click", 1.0, "{}"),
    ])
    q = J.run_stream_sessionize(spark, indir, outdir, ckpt, gap_seconds=1800)
    q.awaitTermination(120)
    rows = spark.read.schema(J.SESSION_OUT).parquet(outdir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["user_id"], r["session_id"], r["n_events"]) == (7, 0, 2)
    assert r["t_start"] == t0
    assert r["t_end"] == t0 + dt.timedelta(seconds=100)
