"""Bigram-LM quality scoring (operators/lm.py) vs an independent
pure-Python oracle implementing the same add-one-smoothed model."""

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.operators.lm import doc_bigrams, lm_score

DOCS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the cat sat on the hat"),
    ("d3", "a dog ran"),
    ("d4", "completely unrelated gibberish text"),
    ("d5", "the"),          # 1 token -> no bigrams -> no output row
    ("d6", ""),             # empty -> no output row
    ("d7", "THE   Cat  sat on the MAT"),  # normalizes to d1's text
]


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_lm_scores(texts: dict[str, str]) -> dict[str, tuple[int, float]]:
    def toks(t):
        return [w for w in " ".join(t.lower().split()).split(" ") if w]

    bi = {d: [(w[i], w[i + 1]) for i in range(len(w) - 1)]
          for d, t in texts.items() if len(w := toks(t)) >= 2}
    c2 = Counter(_h(f"{a} {b}") for pairs in bi.values() for a, b in pairs)
    c1 = Counter(_h(a) for pairs in bi.values() for a, _ in pairs)
    v = len(c1)
    out = {}
    for d, pairs in bi.items():
        lps = [
            math.log((c2[_h(f"{a} {b}")] + 1.0) / (c1[_h(a)] + v))
            for a, b in pairs
        ]
        out[d] = (len(pairs), round(sum(lps) / len(lps), 4))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_lm_score_matches_python_oracle(spark, docs):
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
           for r in lm_score(docs).collect()}
    want = _py_lm_scores(dict(DOCS))
    assert got == want


def test_short_docs_emit_nothing(spark, docs):
    ids = {r["doc_id"] for r in lm_score(docs).collect()}
    assert "d5" not in ids and "d6" not in ids
    assert ids == {"d1", "d2", "d3", "d4", "d7"}


def test_typical_text_outscores_gibberish(spark, docs):
    got = {r["doc_id"]: r["avg_logp"] for r in lm_score(docs).collect()}
    # d1/d2 share most bigrams (typical); d4 is all singletons
    assert got["d1"] > got["d4"]
    assert got["d2"] > got["d4"]


def test_normalization_equates_case_and_ws(spark, docs):
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
           for r in lm_score(docs).collect()}
    assert got["d7"] == got["d1"]


def test_external_training_corpus_smooths_unseen(spark):
    train = spark.createDataFrame(
        [("t1", "the cat sat"), ("t2", "the cat ran")],
        "doc_id string, text string",
    )
    score = spark.createDataFrame(
        [("s1", "the cat sat"), ("s2", "zebra quantum flux")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in lm_score(score, train_docs=train).collect()}
    # V = |{the, cat}| = 2 distinct first-words in training
    # s1: ln((2+1)/(2+2)) + ln((1+1)/(2+2)) averaged
    want_s1 = round((math.log(3 / 4) + math.log(2 / 4)) / 2, 4)
    assert got["s1"]["avg_logp"] == pytest.approx(want_s1)
    # s2: every bigram unseen, every first-word unseen -> ln(1/(0+2))
    assert got["s2"]["avg_logp"] == pytest.approx(round(math.log(1 / 2), 4))


def test_doc_bigrams_plan_stays_jvm(spark, docs):
    plan = doc_bigrams(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
