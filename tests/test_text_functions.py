"""Text-analysis column function tests against Python oracles."""

import re

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.functions import text as T

ROWS = [
    (0, "The quick brown fox, and the lazy dog!!"),
    (1, "  spaced    out\ttabs\nand newlines  "),
    (2, "short"),
    (3, "el gato y la casa de madera que vimos ayer"),
    (4, "a" * 50 + " " + "b" * 3),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_token_count(df):
    got = {r["doc_id"]: r["n"] for r in
           df.select("doc_id", T.token_count(F.col("text")).alias("n")).collect()}
    for i, t in ROWS:
        assert got[i] == len([x for x in re.split(r"\s+", t.strip()) if x]), i


def test_bpe_piece_count(df):
    got = {r["doc_id"]: r["n"] for r in
           df.select("doc_id", T.bpe_ish_piece_count(F.col("text")).alias("n")).collect()}
    for i, t in ROWS:
        toks = [x for x in re.split(r"\s+", t.strip()) if x]
        want = sum(max(1, -(-len(x) // 4)) for x in toks)
        assert got[i] == want, i


def test_normalize_and_fingerprint(df):
    import hashlib

    got = {r["doc_id"]: r["fp"] for r in
           df.select("doc_id", T.fingerprint(F.col("text")).alias("fp")).collect()}
    for i, t in ROWS:
        norm = re.sub(r"\s+", " ", t).strip().lower()
        assert got[i] == hashlib.md5(norm.encode()).hexdigest(), i


def test_punct_ratio_bounds(df):
    rows = df.select("doc_id", T.punct_ratio(F.col("text")).alias("p")).collect()
    for r in rows:
        assert 0.0 <= r["p"] <= 1.0
    by_id = {r["doc_id"]: r["p"] for r in rows}
    assert by_id[0] > 0.0  # has punctuation
    assert by_id[2] == 0.0


def test_quality_score_range_and_signal(df):
    by_id = {r["doc_id"]: r["q"] for r in
             df.select("doc_id", T.quality_score(F.col("text")).alias("q")).collect()}
    assert all(0.0 <= q <= 1.0 for q in by_id.values())
    # a 1-token doc fails the length band; a 10+-token clean doc scores higher
    assert by_id[3] > by_id[2]


def test_shingles_contents(df):
    got = {r["doc_id"]: set(r["sh"]) for r in
           df.select("doc_id", T.shingles(F.col("text"), 3).alias("sh")).collect()}
    t = ROWS[3][1]
    toks = t.split()
    want = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    assert got[3] == want
    assert got[2] == {"short"}


def test_portable_hash64_matches_duckdb(df):
    import duckdb

    got = {r["doc_id"]: r["h"] for r in
           df.select("doc_id", T.portable_hash64(F.col("text")).alias("h")).collect()}
    con = duckdb.connect()
    for i, t in ROWS:
        want = con.execute(
            "SELECT CAST(('0x' || substr(md5(?),1,15)) AS BIGINT)", [t]
        ).fetchone()[0]
        assert got[i] == want, i
