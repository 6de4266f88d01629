"""Sessionize (SURVEY.md W1 generalized) — gap-based session assignment.

Round-1 regression: the driver testdata ``events.ts`` is TIMESTAMP_NTZ and
Spark 4 rejects ``CAST(TIMESTAMP_NTZ AS BIGINT)``, which broke the
registered ``sessionize`` query while the suite stayed green (tests only
used LTZ timestamps). These tests read the REAL sf0.001 parquet so the
NTZ path is exercised, and cross-check against an independent pure-Python
oracle.
"""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

from pg_iui_ner_api_spark.operators.sessionize import session_stats, sessionize


def _py_sessionize(rows, gap=1800):
    """Independent oracle: rows = [(user_id, ts_epoch, event_id)]."""
    out = {}
    by_user = {}
    for u, t, e in rows:
        by_user.setdefault(u, []).append((t, e))
    for u, evs in by_user.items():
        evs.sort()
        sid = -1
        prev = None
        for t, e in evs:
            if prev is None or t - prev > gap:
                sid += 1
            out[(u, e)] = sid
            prev = t
    return out


def test_sessionize_real_parquet_ntz(spark, sf_dir):
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # Guard: this test exists to cover the NTZ dtype specifically.
    assert isinstance(events.schema["ts"].dataType, TimestampNTZType)
    s = sessionize(events, gap_seconds=1800)
    got = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in s.select("user_id", "event_id", "session_id").collect()
    }
    raw = [
        (r["user_id"], r["ts"].replace(tzinfo=dt.timezone.utc).timestamp(), r["event_id"])
        for r in events.select("user_id", "ts", "event_id").collect()
    ]
    want = _py_sessionize(raw)
    assert got == want
    # session ids are 0-based and contiguous per user
    stats = session_stats(events, gap_seconds=1800)
    per_user = (
        stats.groupBy("user_id")
        .agg(F.min("session_id").alias("lo"), F.max("session_id").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in per_user:
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1


def test_sessionize_ntz_literal_gaps(spark):
    schema = StructType([
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
    ])
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 1, t0),
        (1, 2, t0 + dt.timedelta(seconds=100)),      # same session
        (1, 3, t0 + dt.timedelta(seconds=2000)),     # gap > 1800 -> new
        (1, 4, t0 + dt.timedelta(seconds=2100)),     # same session
        (2, 5, t0),                                  # other user starts at 0
    ]
    df = spark.createDataFrame(rows, schema)
    got = {r["event_id"]: r["session_id"]
           for r in sessionize(df, gap_seconds=1800).collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


def test_session_stats_counts(spark):
    schema = StructType([
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
    ])
    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [(7, i, t0 + dt.timedelta(seconds=i * 10)) for i in range(5)]
    rows.append((7, 99, t0 + dt.timedelta(hours=3)))
    df = spark.createDataFrame(rows, schema)
    stats = {r["session_id"]: r["n_events"]
             for r in session_stats(df, gap_seconds=1800).collect()}
    assert stats == {0: 5, 1: 1}
