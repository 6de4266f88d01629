"""WARC ingestion: round-trip, quarantine, resynchronization."""

from __future__ import annotations

import os

from pg_iui_ner_api_spark.sources.warc import (
    read_warc,
    warc_to_docs,
    write_synth_warc,
)

PAGES = [
    (
        "<urn:uuid:0001>",
        "http://example.com/a",
        "<html><body><h1>Page A</h1><p>alpha beta</p></body></html>",
    ),
    (
        "<urn:uuid:0002>",
        "http://example.com/b?utm_source=x",
        "<html><body><p>gamma &amp; delta</p><script>no()</script></body></html>",
    ),
    (
        "<urn:uuid:0003>",
        "http://example.com/c",
        "plain text page",
    ),
]


def test_warc_round_trip(spark, tmp_path):
    p = os.path.join(tmp_path, "seg.warc")
    write_synth_warc(p, PAGES)
    records = read_warc(spark, p)
    rows = records.collect()
    assert len(rows) == 3
    assert all(r.error is None for r in rows)
    assert {r.warc_type for r in rows} == {"response"}
    assert [r.content_length for r in rows] == [
        len(h.encode()) for _, _, h in PAGES
    ]
    docs, rejects = warc_to_docs(records)
    got = {r.doc_id: (r.url, r.text) for r in docs.collect()}
    assert rejects.count() == 0
    assert got["<urn:uuid:0001>"] == ("http://example.com/a", "Page A\nalpha beta")
    assert got["<urn:uuid:0002>"][1] == "gamma & delta"
    assert got["<urn:uuid:0003>"][1] == "plain text page"


def test_warc_non_response_records_filtered_not_quarantined(spark, tmp_path):
    p = os.path.join(tmp_path, "info.warc")
    body = b"software: synth"
    with open(p, "wb") as f:
        f.write(
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"WARC-Record-ID: <urn:uuid:info>\r\n"
            b"Content-Type: application/warc-fields\r\n"
            b"Content-Length: %d\r\n\r\n" % len(body) + body + b"\r\n\r\n"
        )
    write_synth_warc(p + "2", PAGES[:1])
    records = read_warc(spark, os.path.join(tmp_path, "*"))
    docs, rejects = warc_to_docs(records)
    assert records.count() == 2
    assert docs.count() == 1  # warcinfo filtered
    assert rejects.count() == 0


def test_warc_malformed_resync(spark, tmp_path):
    """A record with a broken Content-Length quarantines, and the
    parser resynchronizes on the next WARC/ magic so the following
    record still parses."""
    p = os.path.join(tmp_path, "bad.warc")
    good = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:good>\r\n"
        b"WARC-Target-URI: http://ok\r\nContent-Type: text/html\r\n"
        b"Content-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:bad>\r\n"
        b"Content-Length: oops\r\n\r\n"
    )
    with open(p, "wb") as f:
        f.write(bad + good)
    records = read_warc(spark, p)
    errs = {r.record_id: r.error for r in records.where("error is not null").collect()}
    assert errs == {"<urn:uuid:bad>": "bad_content_length"}
    ok = records.where("error is null").collect()
    assert [r.record_id for r in ok] == ["<urn:uuid:good>"]
    docs, rejects = warc_to_docs(records)
    assert docs.count() == 1
    assert {r.reason for r in rejects.collect()} == {"bad_content_length"}


def test_warc_truncated_payload(spark, tmp_path):
    p = os.path.join(tmp_path, "trunc.warc")
    with open(p, "wb") as f:
        f.write(
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:uuid:t>\r\n"
            b"WARC-Target-URI: http://t\r\nContent-Type: text/html\r\n"
            b"Content-Length: 9999\r\n\r\nshort"
        )
    records = read_warc(spark, p)
    rows = records.collect()
    assert len(rows) == 1 and rows[0].error == "truncated_payload"


def test_warc_lf_only_endings(spark, tmp_path):
    p = os.path.join(tmp_path, "lf.warc")
    body = b"<p>lf page</p>"
    with open(p, "wb") as f:
        f.write(
            b"WARC/1.0\nWARC-Type: response\n"
            b"WARC-Record-ID: <urn:uuid:lf>\n"
            b"WARC-Target-URI: http://lf\nContent-Type: text/html\n"
            b"Content-Length: %d\n\n" % len(body) + body
        )
    records = read_warc(spark, p)
    docs, _ = warc_to_docs(records)
    got = docs.collect()
    assert len(got) == 1 and got[0].text == "lf page"


def test_warc_binary_payload_preserved(spark, tmp_path):
    """Invalid UTF-8 decodes with replacement in payload_text while the
    raw bytes survive untouched in payload."""
    p = os.path.join(tmp_path, "bin.warc")
    body = b"\xff\xfe<p>x</p>"
    with open(p, "wb") as f:
        f.write(
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:uuid:b>\r\n"
            b"WARC-Target-URI: http://b\r\nContent-Type: text/html\r\n"
            b"Content-Length: %d\r\n\r\n" % len(body) + body + b"\r\n\r\n"
        )
    r = read_warc(spark, p).collect()[0]
    assert bytes(r.payload) == body
    assert "�" in r.payload_text and "<p>x</p>" in r.payload_text


def test_warc_application_http_strips_headers(spark, tmp_path):
    """Common Crawl-shaped records (application/http; msgtype=response):
    the HTTP status line and headers must NOT leak into extracted text;
    only the body after the first blank line is extracted (r4 ADVICE)."""
    from pg_iui_ner_api_spark.sources.warc import write_synth_warc_http

    p = os.path.join(tmp_path, "cc.warc")
    write_synth_warc_http(p, PAGES)
    docs, rejects = warc_to_docs(read_warc(spark, p))
    got = {r.doc_id: r.text for r in docs.collect()}
    assert rejects.count() == 0
    assert got["<urn:uuid:0001>"] == "Page A\nalpha beta"
    assert got["<urn:uuid:0002>"] == "gamma & delta"
    assert got["<urn:uuid:0003>"] == "plain text page"
    for text in got.values():
        assert "HTTP/1.1" not in text
        assert "Content-Type" not in text
        assert "Server:" not in text


def test_warc_application_http_non_text_inner_type_filtered(spark, tmp_path):
    """An application/http record whose inner Content-Type is not text
    (e.g. a PDF response) is filtered, not extracted or quarantined."""
    from pg_iui_ner_api_spark.sources.warc import write_synth_warc_http

    p = os.path.join(tmp_path, "pdf.warc")
    write_synth_warc_http(
        p, [("<urn:uuid:pdf>", "http://example.com/f.pdf", "%PDF-fake")],
        inner_content_type="application/pdf",
    )
    docs, rejects = warc_to_docs(read_warc(spark, p))
    assert docs.count() == 0
    assert rejects.count() == 0


def test_warc_application_http_headers_only_filtered(spark, tmp_path):
    """A malformed HTTP payload with no blank line (headers only) has no
    body to extract -> filtered as non-text, never emits header text."""
    p = os.path.join(tmp_path, "hdr.warc")
    http = b"HTTP/1.1 204 No Content\r\nContent-Type: text/html\r\n"
    hdr = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Record-ID: <urn:uuid:h>\r\n"
        "WARC-Target-URI: http://example.com/h\r\n"
        "WARC-Date: 2026-01-01T00:00:00Z\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("ascii")
    with open(p, "wb") as f:
        f.write(hdr + http + b"\r\n\r\n")
    docs, rejects = warc_to_docs(read_warc(spark, p))
    assert docs.count() == 0
    assert rejects.count() == 0
