"""Declared schemas for every engine table (SURVEY.md §1.2).

The reference declares its schemas statically too (SQLAlchemy ``Mapped``
columns, /root/reference/src/database/models.py:7-24; pydantic response
docstring, /root/reference/src/routers/main_endpoints.py:129-143).
Nothing here is inferred: every stage validates against these.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Core corpus: interleaved text+media documents (BASELINE.json input_hint).
# kind='text'  -> NER-eligible, media_ref is null
# kind='image'|'audio'|'video' -> passthrough payload, text='' and media_ref set
# offset = char offset of the span start in the "virtual document" formed by
# concatenating text spans' text and one U+FFFC placeholder char per media
# span; it totally orders spans within a doc (the order-equality invariant).
# ---------------------------------------------------------------------------
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# Mention = one NER span, the engine analogue of the reference response's
# words[] element {entity_group, score, word, start, end}
# (main_endpoints.py:129-143,166-176).  sentence_id is the 0-based sentence
# ordinal within the text span (triple assembly joins on it).
MENTIONS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("mention_id", T.StringType(), False),  # content hash
        T.StructField("entity_group", T.StringType(), False),  # PER|ORG|LOC|MISC
        T.StructField("word", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("score", T.FloatType(), False),
        T.StructField("sentence_id", T.IntegerType(), False),
        # short sentence-clipped context window around the mention,
        # captured in the same extraction pass so the corpus is scanned
        # exactly once; the entity-link rerank (M5) encodes it JVM-side.
        T.StructField("ctx", T.StringType(), True),
    ]
)

# Predicate phrase occurrence inside a text span (emitted by the same
# single-pass extractor as mentions so the corpus is scanned once).
PREDICATES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("sentence_id", T.IntegerType(), False),
    ]
)

# Combined single-pass extraction row: row_kind='mention' | 'pred'.
EXTRACTION = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("row_kind", T.StringType(), False),
        T.StructField("entity_group", T.StringType(), True),  # mention rows
        T.StructField("word", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("score", T.FloatType(), True),
        T.StructField("sentence_id", T.IntegerType(), False),
        T.StructField("ctx", T.StringType(), True),
    ]
)

CANDIDATES = T.StructType(
    [
        T.StructField("mention_id", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("alias", T.StringType(), False),
        T.StructField("prior", T.DoubleType(), False),
        T.StructField("emb_sim", T.DoubleType(), True),
    ]
)

LINKS = T.StructType(
    [
        T.StructField("mention_id", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

NODES = T.StructType(
    [
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("canonical_name", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_mentions", T.LongType(), False),
    ]
)

EDGES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("evidence", T.StringType(), True),
    ]
)

# Model registry — mirrors reference table ai_model
# (/root/reference/src/database/models.py:7-24) column for column.
MODEL_REGISTRY = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("base_model", T.StringType(), False),
        T.StructField("file_path", T.StringType(), False),
        T.StructField("date_created", T.DateType(), False),
        T.StructField("is_training", T.BooleanType(), False),
        T.StructField("model_name", T.StringType(), False),
        T.StructField("train_file_path", T.StringType(), True),
        T.StructField("valid_file_path", T.StringType(), True),
        T.StructField("test_file_path", T.StringType(), True),
        T.StructField("training_process_id", T.LongType(), True),
        T.StructField("is_trained", T.BooleanType(), False),
        T.StructField("version", T.IntegerType(), False),
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("num_of_epochs", T.IntegerType(), False),
    ]
)

# Process registry — reference table process_id (models.py:49-52).
PROCESS_REGISTRY = T.StructType(
    [
        T.StructField("pid", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)

# Per-stage, per-partition lineage row (north_rule resumability).
LINEAGE = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)

# Fixed BIO label vocabulary — reference models_utils.py:6-16.
LABEL2ID = {
    "O": 0,
    "B-PER": 1,
    "I-PER": 2,
    "B-ORG": 3,
    "I-ORG": 4,
    "B-LOC": 5,
    "I-LOC": 6,
    "B-MISC": 7,
    "I-MISC": 8,
}
ID2LABEL = {v: k for k, v in LABEL2ID.items()}
ENTITY_GROUPS = ("PER", "ORG", "LOC", "MISC")

# Sequence cap — reference training.py:13 (MAX_LEN=512). Text beyond 512
# tokens in a span is dropped by the reference pipeline; we replicate for
# parity (chunk-with-overlap is available behind a flag in operators/ner.py).
MAX_LEN = 512

# One U+FFFC OBJECT REPLACEMENT CHARACTER stands in for each media span in
# the virtual-document offset space.
MEDIA_PLACEHOLDER = "￼"
