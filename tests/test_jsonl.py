"""JSONL ingestion source (sources/jsonl.py): parse + quarantine
semantics, span-order invariant enforcement, and round-trip identity
with the synth corpus."""

import json
import os

from pyspark.sql import functions as F

from pg_iui_ner_api_spark.sources.jsonl import read_docs_jsonl, validate_docs


def _write(tmp_path, lines, name="part-0.jsonl"):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w") as f:
        f.write("\n".join(lines))
    return str(tmp_path)


def _span(kind, text, offset, media_ref=None):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def test_good_lines_parse_to_documents_schema(spark, tmp_path):
    lines = [
        json.dumps(
            {"doc_id": "d1", "spans": [_span("text", "hello world", 0)]}
        ),
        json.dumps(
            {
                "doc_id": "d2",
                "spans": [
                    _span("text", "before", 0),
                    _span("image", "", 7, "img://x"),
                    _span("text", "after", 8),
                ],
            }
        ),
    ]
    docs, rejects = validate_docs(
        read_docs_jsonl(spark, _write(tmp_path, lines))
    )
    assert rejects.count() == 0
    got = {r["doc_id"]: r["spans"] for r in docs.collect()}
    assert set(got) == {"d1", "d2"}
    # span order and media_ref survive
    assert [s["kind"] for s in got["d2"]] == ["text", "image", "text"]
    assert got["d2"][1]["media_ref"] == "img://x"
    assert [f.name for f in docs.schema["spans"].dataType.elementType.fields] \
        == ["kind", "text", "media_ref", "offset"]


def test_quarantine_reasons(spark, tmp_path):
    lines = [
        "{not json at all",
        json.dumps({"spans": [_span("text", "x", 0)]}),              # no doc_id
        json.dumps({"doc_id": "e1", "spans": []}),                   # empty
        json.dumps({"doc_id": "e2"}),                                # null spans
        json.dumps({"doc_id": "e3", "spans": [_span("text", "x", -1)]}),
        json.dumps(
            {
                "doc_id": "e4",
                "spans": [_span("text", "b", 5), _span("text", "a", 0)],
            }
        ),                                                           # unordered
        json.dumps({"doc_id": "ok", "spans": [_span("text", "fine", 0)]}),
    ]
    docs, rejects = validate_docs(
        read_docs_jsonl(spark, _write(tmp_path, lines))
    )
    assert [r["doc_id"] for r in docs.collect()] == ["ok"]
    reasons = sorted(r["reason"] for r in rejects.collect())
    assert reasons == sorted(
        [
            "malformed_json",
            "missing_doc_id",
            "empty_spans",
            "empty_spans",
            "invalid_span",
            "unordered_spans",
        ]
    )
    # the malformed line's raw text is preserved for replay
    raw = {r["reason"]: r["raw"] for r in rejects.collect()}
    assert raw["malformed_json"] == "{not json at all"


def test_single_span_doc_is_ordered(spark, tmp_path):
    lines = [json.dumps({"doc_id": "s", "spans": [_span("text", "x", 3)]})]
    docs, rejects = validate_docs(
        read_docs_jsonl(spark, _write(tmp_path, lines))
    )
    assert docs.count() == 1 and rejects.count() == 0


def test_roundtrip_synth_corpus(spark, tmp_path):
    """synth docs -> JSONL -> read back == identity (the span-sequence
    equality invariant through the ingestion boundary)."""
    from pg_iui_ner_api_spark import synth

    docs = synth.synth_documents(spark, 40)
    p = os.path.join(str(tmp_path), "synth")
    docs.select(F.to_json(F.struct("doc_id", "spans")).alias("value")) \
        .coalesce(1).write.mode("overwrite").text(p)
    back, rejects = validate_docs(read_docs_jsonl(spark, p))
    assert rejects.count() == 0
    a = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in docs.collect()}
    b = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in back.collect()}
    assert a == b


def test_null_offset_quarantined(spark, tmp_path):
    lines = [
        json.dumps(
            {"doc_id": "n", "spans": [{"kind": "text", "text": "x",
                                       "media_ref": None, "offset": None}]}
        )
    ]
    docs, rejects = validate_docs(
        read_docs_jsonl(spark, _write(tmp_path, lines))
    )
    assert docs.count() == 0
    assert [r["reason"] for r in rejects.collect()] == ["invalid_span"]
