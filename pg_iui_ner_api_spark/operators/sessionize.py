"""Gap-based sessionization (SURVEY.md W1 generalized).

The reference sessionizes CoNLL-U lines by blank-line boundaries
(process_input_file.py:36-50) — a degenerate gap rule. The general
operator: order events per key, start a new session whenever the gap to
the previous event exceeds ``gap_seconds`` (the islands-and-gaps
pattern). One shuffle (window partition by key), pure window functions,
exactly expressible in ANSI SQL so the DuckDB oracle covers it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, key_col: str = "user_id", ts_col: str = "ts",
               gap_seconds: int = 1800) -> DataFrame:
    """events -> one row per event with its session ordinal per key.

    session_id = running count of gap-exceeding boundaries, 0-based, in
    event-time order per key. Ties on ts are ordered by event_id for
    determinism.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    # TIMESTAMP_NTZ-safe epoch seconds: Spark 4 rejects CAST(TIMESTAMP_NTZ AS
    # BIGINT) directly, but NTZ -> TIMESTAMP -> BIGINT is legal and what the
    # driver testdata (events.ts is TIMESTAMP_NTZ) needs.
    ts_sec = F.col(ts_col).cast("timestamp").cast("long")
    prev_sec = F.lag(ts_sec).over(w)
    new_session = F.when(
        prev_sec.isNull() | (ts_sec - prev_sec > gap_seconds),
        1,
    ).otherwise(0)
    return events.withColumn("_ns", new_session).withColumn(
        "session_id", F.sum("_ns").over(w) - 1
    ).drop("_ns")


def session_stats(events: DataFrame, key_col: str = "user_id", ts_col: str = "ts",
                  gap_seconds: int = 1800) -> DataFrame:
    """One row per (key, session): event count + span bounds."""
    s = sessionize(events, key_col, ts_col, gap_seconds)
    return s.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("t_start"),
        F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("t_end"),
    )
