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


# ---------------------------------------------------------------------------
# degenerate inputs for the late-r4 operators
# ---------------------------------------------------------------------------
def test_sssp_unreachable_and_isolated_source(spark):
    from pg_iui_ner_api_spark.operators import graph as G

    # 1->2 only; 3->4 is a separate component: unreachable nodes are
    # simply absent, never NULL-distance rows
    e = spark.createDataFrame([(1, 2, 5), (3, 4, 1)], ["src", "dst", "w"])
    got = {r["node"]: r["dist"] for r in G.sssp(e, source=1, rounds=3).collect()}
    assert got == {1: 0, 2: 5}
    # source with no outgoing edges: the walk stays put
    got2 = {r["node"]: r["dist"] for r in G.sssp(e, source=4, rounds=2).collect()}
    assert got2 == {4: 0}


def test_transitive_closure_empty_and_single_edge(spark):
    from pg_iui_ner_api_spark.operators import graph as G

    e = spark.createDataFrame([(1, 2)], ["src", "dst"])
    got = {
        (r["node"], r["ancestor"]): r["depth"]
        for r in G.transitive_closure(e, max_depth=4).collect()
    }
    assert got == {(1, 2): 1}
    empty = e.where("src < 0")
    assert G.transitive_closure(empty, max_depth=3).count() == 0


def test_fuse_triples_empty_and_single_row(spark):
    from pg_iui_ner_api_spark.operators.fusion import fuse_triples

    df = spark.createDataFrame(
        [("a", "p", "b", 0.3, "d1")], ["subj", "pred", "obj", "score", "doc_id"]
    )
    row = fuse_triples(df).collect()[0]
    assert row["n_mentions"] == 1 and row["n_docs"] == 1
    assert row["noisy_or"] == pytest.approx(0.3, abs=1e-12)
    assert fuse_triples(df.where("score < 0")).count() == 0


def test_align_text_to_media_media_only_and_empty(spark):
    from pg_iui_ner_api_spark.operators import media as M

    rows = [("a", 0, "image", "m1", 0), ("a", 1, "audio", "m2", 5)]
    df = spark.createDataFrame(
        rows, schema=["doc_id", "span_idx", "kind", "media_ref", "offset"]
    )
    # media-only doc: no text rows survive
    assert M.align_text_to_media(df).count() == 0
    assert M.align_text_to_media(df.where("offset < 0")).count() == 0


def test_dictionary_encode_all_null_column(spark):
    from pg_iui_ner_api_spark.operators.encoding import dictionary_encode

    df = spark.createDataFrame([(None,), (None,)], schema="s string")
    assert dictionary_encode(df, "s").count() == 0


def test_key_skew_fewer_keys_than_topn(spark):
    from pg_iui_ner_api_spark.operators.analytics import key_skew

    df = spark.createDataFrame([("a",), ("a",), ("b",)], schema=["k"])
    rows = key_skew(df, "k", top_n=10).orderBy("rank").collect()
    assert [(r["key"], r["rank"]) for r in rows] == [("a", 1), ("b", 2)]
    assert sum(r["share"] for r in rows) == pytest.approx(1.0)


def test_scd2_single_event_per_key(spark):
    from pg_iui_ner_api_spark.operators.analytics import scd2_build

    df = spark.createDataFrame([("u1", 1, "x")], schema=["k", "ts", "v"])
    rows = scd2_build(df, "k", "ts", ["v"]).collect()
    assert len(rows) == 1
    assert rows[0]["valid_from"] == 1 and rows[0]["valid_to"] is None
