"""Structured Streaming jobs (SURVEY.md §2.9).

The reference's streaming-shaped ops are batch loops: sentence
sessionization with carried state (W1, process_input_file.py:36-62) and
count-based batch flushing (W2, lines 47-50), plus a polling scheduler
(W3/W4). Their engine equivalents:

  * ``stream_extract_mentions`` — the NER hot path as an incremental
    job: ``readStream`` over the documents table directory, the same
    mapInPandas extraction operator as batch (operator code is shared —
    one implementation, two execution modes), ``writeStream`` append.
    New corpus partitions landing in the directory are processed
    exactly once per trigger; with ``availableNow`` the job drains the
    backlog and stops, which is how a 100 TB backfill runs without a
    separate batch code path.
  * ``stream_windowed_event_counts`` — event-time tumbling window with
    a watermark for late data (W2's time-based twin; the driver
    testdata ``events`` table has real timestamps).

Checkpointing: Spark's own streaming checkpoint (offset log + state
store) supplies exactly-once per sink; the batch pipeline's lineage
manifest (plans/lineage.py) is the batch-mode analogue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schema as S
from ..operators import ner as N


def stream_documents(spark: SparkSession, input_dir: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming scan of a documents parquet directory (append table)."""
    r = spark.readStream.schema(S.DOCUMENTS)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(input_dir)


def stream_extract_mentions(spark: SparkSession, input_dir: str, output_dir: str,
                            checkpoint_dir: str, available_now: bool = True):
    """documents stream -> mentions parquet, exactly once per file.

    Returns the StreamingQuery; callers awaitTermination (availableNow
    drains and stops — the backfill/test mode) or leave it running as a
    continuous ingestion job.
    """
    docs = stream_documents(spark, input_dir)
    mentions = N.mentions_of(N.extract(docs))
    writer = (
        mentions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_event_counts(events: DataFrame, window: str = "1 hour",
                                 watermark: str = "2 hours") -> DataFrame:
    """Event-time tumbling counts with late-data watermark (W2).

    ``events`` is a streaming DataFrame with (ts timestamp, event_type
    string, value double); output one row per (window, event_type) once
    the watermark passes the window end.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_value")
    )


def run_windowed_event_counts(spark: SparkSession, input_dir: str, output_dir: str,
                              checkpoint_dir: str):
    """File-source streaming variant over an events parquet directory."""
    ev = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        ).parquet(input_dir)
    )
    counts = stream_windowed_event_counts(ev)
    return (
        counts.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
