"""Distant-supervision pair export vs hand-enumerated expectations."""

from __future__ import annotations

import pytest

from pg_iui_ner_api_spark.operators.distant import (
    distant_dropped_sentences,
    distant_pairs,
)

# one sentence with three mentions (two entities related in the KG, one
# unrelated), a second sentence exercising the NA class, a third
# sentence exceeding the cap
LM = [
    # doc, span, sent, mention_id, entity_id, word, start
    ("d1", 0, 0, "m1", "PER:ada", "Ada", 0),
    ("d1", 0, 0, "m2", "ORG:acme", "Acme", 10),
    ("d1", 0, 0, "m3", "LOC:paris", "Paris", 20),
    ("d2", 0, 0, "m4", "PER:ada", "Ada", 0),
    ("d2", 0, 0, "m5", "LOC:berlin", "Berlin", 8),
]
COLS = ["doc_id", "span_idx", "sentence_id", "mention_id", "entity_id",
        "word", "start"]
EDGES = [
    ("PER:ada", "works_for", "ORG:acme"),
    ("ORG:acme", "located_in", "LOC:paris"),
    ("PER:ada", "advises", "ORG:acme"),  # multi-label same pair
]


@pytest.fixture(scope="module")
def lm(spark):
    return spark.createDataFrame(LM, COLS)


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(EDGES, ["subj", "pred", "obj"])


def test_positive_and_na_labels(spark, lm, edges):
    rows = {
        (r.subj_mention_id, r.obj_mention_id, r.label)
        for r in distant_pairs(lm, edges).collect()
    }
    # ordered pairs in sentence d1: (m1,m2),(m2,m1),(m1,m3),(m3,m1),
    # (m2,m3),(m3,m2); d2: (m4,m5),(m5,m4)
    assert ("m1", "m2", "works_for") in rows
    assert ("m1", "m2", "advises") in rows       # multi-label: both rows
    assert ("m2", "m3", "located_in") in rows
    assert ("m2", "m1", "NA") in rows            # direction matters
    assert ("m4", "m5", "NA") in rows            # unrelated pair -> NA
    assert len(rows) == 9  # 8 ordered pairs + 1 extra label on (m1,m2)


def test_negatives_excluded(spark, lm, edges):
    rows = {
        (r.subj_mention_id, r.obj_mention_id, r.label)
        for r in distant_pairs(lm, edges, include_negatives=False).collect()
    }
    assert rows == {
        ("m1", "m2", "works_for"),
        ("m1", "m2", "advises"),
        ("m2", "m3", "located_in"),
    }


def test_sentence_cap_and_report(spark, lm, edges):
    got = distant_pairs(lm, edges, max_per_sentence=2).collect()
    # d1's 3-mention sentence is dropped; only d2's pairs remain
    assert {r.doc_id for r in got} == {"d2"}
    rep = distant_dropped_sentences(lm, max_per_sentence=2).collect()
    assert [(r.doc_id, r.n_mentions) for r in rep] == [("d1", 3)]


def test_ctx_attachment(spark, lm, edges):
    ctx = spark.createDataFrame(
        [("m1", "Ada joined Acme in Paris"), ("m2", "Ada joined Acme in Paris"),
         ("m3", "Ada joined Acme in Paris"), ("m4", "Ada visited Berlin"),
         ("m5", "Ada visited Berlin")],
        ["mention_id", "ctx"],
    )
    got = distant_pairs(lm, edges, ctx_source=ctx).collect()
    assert all(r.subj_ctx for r in got)
    by = {(r.subj_mention_id, r.obj_mention_id): r.subj_ctx for r in got}
    assert by[("m4", "m5")] == "Ada visited Berlin"


def test_pipeline_round_trip(spark):
    """On the synth corpus, every positive label must be a real KG
    predicate and positives must dominate NA for related entities."""
    from pg_iui_ner_api_spark import synth
    from pg_iui_ner_api_spark.operators import ner as N
    from pg_iui_ner_api_spark.plans.pipeline import run_kg_pipeline

    docs = synth.synth_documents(spark, 60, partitions=2)
    res = run_kg_pipeline(spark, docs)
    mentions = N.mentions_of(res["extraction"])
    out = distant_pairs(
        res["linked_mentions"], res["edges"], ctx_source=mentions
    )
    rows = out.collect()
    assert rows
    preds = {r.pred for r in res["edges"].select("pred").distinct().collect()}
    labels = {r.label for r in rows}
    assert labels - {"NA"} <= preds
    assert "NA" in labels
    # the attached window is the extractor's ctx around the SUBJECT
    # mention — it must contain the subject surface (the window is
    # truncated, so the object may fall outside it)
    for r in rows[:50]:
        assert r.subj_word in r.subj_ctx


def test_ctx_attachment_missing_ctx_row_kept(spark, lm, edges):
    """A pair whose subject mention has no ctx row keeps its row with
    subj_ctx null — a missing ctx must never silently drop pairs
    (r4 ADVICE: the join is LEFT, not inner)."""
    ctx = spark.createDataFrame(
        [("m1", "Ada joined Acme in Paris")], ["mention_id", "ctx"]
    )
    got = distant_pairs(lm, edges, ctx_source=ctx).collect()
    # same 9 labeled rows as the no-ctx run: nothing dropped
    assert len(got) == 9
    by = {(r.subj_mention_id, r.obj_mention_id, r.label): r.subj_ctx for r in got}
    assert by[("m1", "m2", "works_for")] == "Ada joined Acme in Paris"
    assert by[("m2", "m1", "NA")] is None
    assert by[("m4", "m5", "NA")] is None
