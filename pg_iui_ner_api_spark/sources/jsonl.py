"""JSONL corpus ingestion source — how interleaved-span documents
arrive from a crawl/export before they are Iceberg/parquet.

The reference ingests documents one-per-HTTP-request as a JSON body
(/root/reference/src/routers/main_endpoints.py:129-176); the batch
analogue of that boundary is newline-delimited JSON, one document per
line, which is also the lingua franca of web-crawl dumps. This source
maps a JSONL directory onto the engine's corpus schema
(schema.DOCUMENTS: doc_id + ordered interleaved spans) with explicit
quarantine semantics instead of the reference's silent 422.

Contract:
  * schema-first read (``spark.read.schema(...).json``) — Spark never
    infers (inference is a full extra pass over 100 TB and can produce
    a different schema per snapshot);
  * PERMISSIVE mode with a corrupt-record column: a malformed line
    quarantines as one reject row (raw line preserved for replay),
    never fails the job, never silently vanishes — same
    no-silent-drops contract as the conllu source's malformed-line
    filter, but with the rejects queryable;
  * post-parse validation (doc_id present, spans non-empty, offsets
    non-negative and strictly increasing) happens in
    :func:`validate_docs` as JVM Column algebra — structurally valid
    JSON with broken span ordering is quarantined too, because the
    span-order invariant is what every downstream operator assumes.

Scale: JSONL splits on line boundaries, so Spark parallelizes a single
huge file across tasks (unlike the conllu wholetext source, which is
per-file by that format's need for cross-line sentence state); parsing
is the JVM Jackson path — no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .. import schema as S

_CORRUPT = "_corrupt_record"

# DOCUMENTS plus the corrupt-record sink; nullability relaxed because
# PERMISSIVE mode emits null fields for half-parsed rows.
_READ_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("spans", T.ArrayType(S.SPAN), True),
        T.StructField(_CORRUPT, T.StringType(), True),
    ]
)


def read_docs_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Parse ``path`` (file/dir/glob of JSONL) into the raw read frame:
    (doc_id, spans, _corrupt_record). Callers almost always want
    :func:`validate_docs` on top; this layer only separates
    JSON-parseable from not."""
    return (
        spark.read.schema(_READ_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )


def validate_docs(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split the raw read into (docs, rejects).

    docs: schema.DOCUMENTS-shaped, every row satisfying the corpus
    invariants. rejects: (reason, raw) — one row per quarantined line,
    the reason machine-readable so ingestion dashboards can aggregate.
    """
    offsets = F.col("spans.offset")
    sorted_ok = F.forall(
        # strictly increasing offsets == spans arrive in document order
        F.zip_with(
            offsets, F.slice(offsets, 2, F.greatest(F.size(offsets) - 1, F.lit(0))),
            lambda a, b: a < b,
        ),
        lambda ok: ok,
    )
    reason = (
        F.when(F.col(_CORRUPT).isNotNull(), "malformed_json")
        .when(F.col("doc_id").isNull(), "missing_doc_id")
        .when(F.col("spans").isNull() | (F.size("spans") == 0), "empty_spans")
        .when(
            # offset NULL must be explicit: (NULL < 0) is NULL, which
            # exists() treats as false — without isNull a null offset
            # would sail through and break the ordering invariant later
            F.exists(
                "spans",
                lambda s: s["kind"].isNull()
                | s["offset"].isNull()
                | (s["offset"] < 0),
            ),
            "invalid_span",
        )
        .when(~sorted_ok, "unordered_spans")
    )
    tagged = raw.select(reason.alias("reason"), "doc_id", "spans", _CORRUPT)
    docs = tagged.where(F.col("reason").isNull()).select("doc_id", "spans")
    rejects = tagged.where(F.col("reason").isNotNull()).select(
        "reason",
        F.coalesce(
            F.col(_CORRUPT),
            F.to_json(F.struct("doc_id", "spans")),
        ).alias("raw"),
    )
    return docs, rejects
