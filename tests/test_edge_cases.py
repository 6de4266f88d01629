"""Degenerate-input tests (FIXTURES.md §1 edge cases): empty corpus,
media-only docs, empty text spans, entities at string boundaries,
duplicate spans, and the historical empty-Arrow-batch regression."""

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark import schema as S, synth
from pg_iui_ner_api_spark.operators import media as M, ner as N
from pg_iui_ner_api_spark.plans.pipeline import run_kg_pipeline


def _docs(spark, rows):
    return spark.createDataFrame(rows, S.DOCUMENTS)


def _span(kind, text="", media_ref=None, offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def test_empty_corpus(spark):
    docs = _docs(spark, [])
    res = run_kg_pipeline(spark, docs)
    assert res["mentions"].count() == 0
    assert res["edges"].count() == 0
    assert res["nodes"].count() == 0


def test_media_only_doc(spark):
    docs = _docs(
        spark,
        [{"doc_id": "m1", "spans": [
            _span("image", media_ref="media://m1/0", offset=0),
            _span("audio", media_ref="media://m1/1", offset=1),
        ]}],
    )
    assert N.mentions_of(N.extract(docs)).count() == 0
    feats = M.extract_media_features(docs).collect()
    assert len(feats) == 2
    # span order preserved through the round trip
    back = N.reassemble_spans(docs).collect()[0]["spans"]
    assert [s["media_ref"] for s in back] == ["media://m1/0", "media://m1/1"]


def test_empty_text_span_and_no_hits(spark):
    docs = _docs(
        spark,
        [
            {"doc_id": "e1", "spans": [_span("text", text="", offset=0)]},
            {"doc_id": "e2", "spans": [_span("text", text="nothing relevant here", offset=0)]},
        ],
    )
    # the all-empty Arrow batch regression probe: must not crash
    assert N.mentions_of(N.extract(docs)).count() == 0


def test_entity_at_string_boundaries(spark):
    docs = _docs(
        spark,
        [{"doc_id": "b1", "spans": [_span("text", text="Curie met Turing", offset=0)]}],
    )
    rows = sorted(
        N.mentions_of(N.extract(docs)).collect(), key=lambda r: r["start"]
    )
    assert [(r["word"], r["start"], r["end"]) for r in rows] == [
        ("Curie", 0, 5),
        ("Turing", 10, 16),
    ]


def test_duplicate_identical_spans(spark):
    s = _span("text", text="Curie works for Acme, the company.", offset=0)
    s2 = dict(s, offset=100)
    docs = _docs(spark, [{"doc_id": "d1", "spans": [s, s2]}])
    m = N.mentions_of(N.extract(docs)).collect()
    # both spans produce mentions with distinct span_idx and mention_ids
    by_span = {}
    for r in m:
        by_span.setdefault(r["span_idx"], set()).add(r["mention_id"])
    assert set(by_span) == {0, 1}
    assert by_span[0].isdisjoint(by_span[1])


def test_punctuation_adjacent_entities(spark):
    docs = _docs(
        spark,
        [{"doc_id": "p1", "spans": [_span("text", text="(Acme), Globex; Paris!", offset=0)]}],
    )
    words = {r["word"] for r in N.mentions_of(N.extract(docs)).collect()}
    assert words == {"Acme", "Globex", "Paris"}


def test_pipeline_on_handcrafted_micro_corpus(spark):
    docs = _docs(
        spark,
        [
            {"doc_id": "x1", "spans": [
                _span("text", text="Curie works for Acme Corp, the company.", offset=0),
                _span("image", media_ref="media://x1/1", offset=40),
            ]},
            {"doc_id": "x2", "spans": [
                _span("text", text="Acme Corp, the company, is located in Paris.", offset=0),
            ]},
        ],
    )
    res = run_kg_pipeline(spark, docs)
    triples = {(r["subj"], r["pred"], r["obj"]) for r in res["edges"].collect()}
    assert ("PER:marie_curie", "works_for", "ORG:acme") in triples
    assert ("ORG:acme", "located_in", "LOC:paris") in triples
