"""WARC crawl-archive ingestion source (ISO 28500 / WARC 1.0).

The web-scale twin of the JSONL source: raw crawls arrive as WARC
container files (the Common Crawl / Internet Archive interchange
format — public spec, ISO 28500), and the ingest boundary has to turn
them into the engine's document shape. Same quarantine contract as
``sources/jsonl.py``: malformed records become queryable reject rows
with machine-readable reasons, never silent drops, never job failures.

Format recap (uncompressed WARC): each record is

    WARC/1.0\\r\\n
    <Name>: <value>\\r\\n ...          (header block)
    \\r\\n
    <Content-Length bytes of payload>
    \\r\\n\\r\\n                        (record separator)

Parsing strategy: ``binaryFile`` read -> one ``mapInPandas`` pass that
walks each file's bytes record-by-record. This is Python on the FORMAT
BOUNDARY only — the same dispensation as the conllu wholetext source:
a binary container with length-prefixed records cannot be split by
Spark's line reader, and the parse emits narrow typed columns that
everything downstream consumes as pure Column algebra
(``functions.web.html_to_text``, ``canonicalize_url``). Parallelism is
per-file, which matches how crawl archives ship (many ~1 GB segment
files); production WARCs are gzip-per-record, where a scale
implementation also gets in-file splits by resynchronizing on gzip
member boundaries — out of scope here (no record-gzip corpus exists in
this sandbox), and orthogonal to the record semantics this module
pins.

UTF-8 decoding of payloads happens in the parser with replacement
characters (a crawl always contains undeclared encodings; ingest must
not throw), and the raw payload bytes are preserved alongside so
nothing is lost for a later, better decoder.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("src_file", T.StringType(), False),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("content_length", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("payload_text", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

_MAGIC = b"WARC/"


def _parse_warc_bytes(src: str, buf: bytes) -> Iterator[dict]:
    """Yield one dict per record (or per quarantined segment) from one
    WARC file's bytes. Tolerates \\n-only line endings; resynchronizes
    on the next WARC/ magic after a malformed record so one bad record
    never consumes the rest of the file."""
    pos, n = 0, len(buf)
    while True:
        start = buf.find(_MAGIC, pos)
        if start < 0:
            if buf[pos:].strip():
                yield {"src_file": src, "error": "trailing_garbage"}
            return
        if buf[pos:start].strip():
            yield {"src_file": src, "error": "inter_record_garbage"}
        hdr_end = buf.find(b"\r\n\r\n", start)
        hdr_end_n = buf.find(b"\n\n", start)
        if hdr_end < 0 or (0 <= hdr_end_n < hdr_end):
            hdr_end, sep = (hdr_end_n, 2) if hdr_end_n >= 0 else (-1, 0)
        else:
            sep = 4
        if hdr_end < 0:
            yield {"src_file": src, "error": "unterminated_header"}
            return
        headers: dict[str, str] = {}
        lines = buf[start:hdr_end].decode("utf-8", "replace").splitlines()
        version = lines[0].strip() if lines else ""
        for line in lines[1:]:
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        body_start = hdr_end + sep
        try:
            length = int(headers["content-length"])
            if length < 0:
                raise ValueError
        except (KeyError, ValueError):
            yield {"src_file": src, "error": "bad_content_length",
                   "record_id": headers.get("warc-record-id")}
            pos = body_start
            continue
        if body_start + length > n:
            yield {"src_file": src, "error": "truncated_payload",
                   "record_id": headers.get("warc-record-id")}
            return
        payload = buf[body_start:body_start + length]
        yield {
            "src_file": src,
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "url": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": length,
            "payload": payload,
            "payload_text": payload.decode("utf-8", "replace"),
            "error": None if version.startswith("WARC/") else "bad_version",
        }
        pos = body_start + length


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Parse ``path`` (file/dir/glob of uncompressed .warc) into one
    row per record, RECORD_SCHEMA-shaped; structural failures surface
    as rows with ``error`` set (see module docstring)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in RECORD_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for src, content in zip(pdf["path"], pdf["content"]):
                for rec in _parse_warc_bytes(src, bytes(content)):
                    rows.append([rec.get(c) for c in cols])
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse, RECORD_SCHEMA)


def warc_to_docs(records: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split parsed records into (docs, rejects).

    docs: ``(doc_id, url, warc_date, text)`` — one row per well-formed
    ``response`` record with an html/text payload, ``text`` extracted
    JVM-side with :func:`functions.web.html_to_text`. rejects:
    ``(reason, src_file, record_id)`` for every quarantined record.
    Non-response record types (warcinfo, request, metadata) are part of
    the format, not errors — they are filtered, not quarantined.

    ``application/http; msgtype=response`` records (the Common Crawl
    shape) carry a full HTTP message: status line + headers + blank
    line + body. The payload is split at the first blank line JVM-side,
    the inner ``Content-Type`` header decides text-ness, and only the
    BODY reaches ``html_to_text`` — the status line and headers never
    leak into document text (r4 ADVICE). A record with no blank line is
    a headers-only/malformed HTTP message and is filtered as non-text.
    """
    from ..functions.web import html_to_text

    reason = (
        F.when(F.col("error").isNotNull(), F.col("error"))
        .when(F.col("record_id").isNull(), F.lit("missing_record_id"))
        .when(
            (F.col("warc_type") == "response") & F.col("url").isNull(),
            F.lit("missing_target_uri"),
        )
    )
    tagged = records.withColumn("reason", reason)
    rejects = tagged.where(F.col("reason").isNotNull()).select(
        "reason", "src_file", "record_id"
    )
    is_http = F.col("content_type").startswith("application/http")
    # First blank line of the HTTP message: prefer CRLFCRLF (RFC 9112),
    # tolerate bare LFLF (lenient servers). instr() is 1-based, 0 = absent.
    crlf = F.instr("payload_text", "\r\n\r\n")
    lf = F.instr("payload_text", "\n\n")
    hdr_len = F.when(crlf > 0, crlf - 1).when(lf > 0, lf - 1)
    body_start = F.when(crlf > 0, crlf + 4).when(lf > 0, lf + 2)
    http_headers = F.col("payload_text").substr(
        F.lit(1), F.coalesce(hdr_len, F.lit(0))
    )
    http_body = F.col("payload_text").substr(
        F.coalesce(body_start, F.lit(1)), F.length("payload_text")
    )
    inner_ct = F.lower(
        F.regexp_extract(http_headers, r"(?im)^content-type:\s*([^\r\n;]+)", 1)
    )
    inner_is_text = inner_ct.startswith("text/html") | inner_ct.startswith(
        "text/plain"
    )
    is_text = (
        F.col("content_type").isNotNull()
        & (
            F.col("content_type").startswith("text/html")
            | F.col("content_type").startswith("text/plain")
            | (is_http & body_start.isNotNull() & inner_is_text)
        )
    )
    text_payload = F.when(is_http, http_body).otherwise(F.col("payload_text"))
    docs = (
        tagged.where(
            F.col("reason").isNull()
            & (F.col("warc_type") == "response")
            & is_text
        )
        .select(
            F.col("record_id").alias("doc_id"),
            "url",
            "warc_date",
            html_to_text(text_payload).alias("text"),
        )
    )
    return docs, rejects


def write_synth_warc(path: str, pages: list[tuple[str, str, str]]) -> None:
    """Write a deterministic uncompressed WARC file for tests:
    ``pages`` is (record_id, url, html). Spec-shaped records with CRLF
    endings and exact Content-Length."""
    with open(path, "wb") as f:
        for rid, url, html in pages:
            body = html.encode("utf-8")
            hdr = (
                "WARC/1.0\r\n"
                f"WARC-Type: response\r\n"
                f"WARC-Record-ID: {rid}\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
                f"Content-Type: text/html\r\n"
                f"Content-Length: {len(body)}\r\n"
                "\r\n"
            ).encode("ascii")
            f.write(hdr + body + b"\r\n\r\n")


def write_synth_warc_http(
    path: str,
    pages: list[tuple[str, str, str]],
    inner_content_type: str = "text/html; charset=utf-8",
) -> None:
    """Like :func:`write_synth_warc` but in the Common Crawl shape:
    ``Content-Type: application/http; msgtype=response`` records whose
    payload is a full HTTP response message (status line + headers +
    blank line + body)."""
    with open(path, "wb") as f:
        for rid, url, html in pages:
            doc = html.encode("utf-8")
            http = (
                "HTTP/1.1 200 OK\r\n"
                f"Content-Type: {inner_content_type}\r\n"
                "Server: synthetic/1.0\r\n"
                f"Content-Length: {len(doc)}\r\n"
                "\r\n"
            ).encode("ascii") + doc
            hdr = (
                "WARC/1.0\r\n"
                f"WARC-Type: response\r\n"
                f"WARC-Record-ID: {rid}\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
                "Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n"
                "\r\n"
            ).encode("ascii")
            f.write(hdr + http + b"\r\n\r\n")
