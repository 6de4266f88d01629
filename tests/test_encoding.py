"""Dictionary encoding: dense deterministic ids without a global window.

Oracle: the ids must equal row_number() over (ORDER BY bucket, value)-1
— replayed here in pure Python via the same md5 bucket hash.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.operators import encoding as ENC


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_encode(values, buckets):
    distinct = sorted(set(v for v in values if v is not None))
    order = sorted(distinct, key=lambda v: (_h64(v) % buckets, v))
    return {v: i for i, v in enumerate(order)}


VALUES = ["ent/a", "ent/b", "ent/c", "ent/a", "zz", "q", None, "ent/b"]


def test_dictionary_encode_matches_oracle(spark):
    df = spark.createDataFrame([(v,) for v in VALUES], schema=["s"])
    got = {r["value"]: r["id"] for r in ENC.dictionary_encode(df, "s", buckets=4).collect()}
    assert got == _py_encode(VALUES, 4)


def test_dictionary_encode_dense_and_deterministic(spark):
    df = spark.createDataFrame([(v,) for v in VALUES], schema=["s"])
    a = {r["value"]: r["id"] for r in ENC.dictionary_encode(df, "s").collect()}
    # dense 0..n-1
    assert sorted(a.values()) == list(range(len(a)))
    # invariant under repartitioning (cluster-size independence)
    b = {
        r["value"]: r["id"]
        for r in ENC.dictionary_encode(df.repartition(7), "s").collect()
    }
    assert a == b


def test_encode_decode_roundtrip(spark):
    df = spark.createDataFrame(
        [("d1", "ent/a"), ("d2", "ent/b"), ("d3", None), ("d4", "unseen")],
        schema=["doc", "s"],
    )
    mapping = ENC.dictionary_encode(
        spark.createDataFrame([(v,) for v in VALUES], schema=["s"]), "s"
    )
    enc = ENC.encode_column(df, mapping, "s")
    rows = {r["doc"]: r["s_id"] for r in enc.collect()}
    want = _py_encode(VALUES, 64)
    assert rows["d1"] == want["ent/a"] and rows["d2"] == want["ent/b"]
    assert rows["d3"] is None and rows["d4"] is None  # null + OOV -> NULL id
    dec = ENC.decode_column(enc, mapping, "s_id", "s")
    back = {r["doc"]: r["s"] for r in dec.collect()}
    assert back == {"d1": "ent/a", "d2": "ent/b", "d3": None, "d4": None}


def test_dictionary_encode_plan_no_global_window(spark):
    df = spark.createDataFrame([(v,) for v in VALUES], schema=["s"])
    plan = (
        ENC.dictionary_encode(df, "s")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the value-carrying row_number window partitions by bucket — never a
    # single-partition global sort over the dimension
    rn_lines = [ln for ln in plan.splitlines() if "row_number" in ln]
    assert rn_lines and all("bucket#" in ln for ln in rn_lines)
    assert "BroadcastHashJoin" in plan  # B-row offsets broadcast back
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
