"""Span-sequence + mention parity vs the independent oracle (BASELINE.json).

Gate 1 (input_hint): per-document span-sequence equality
(kind, text, media_ref, order) after a full explode/shuffle round trip.
Gate 2: engine mentions == oracle mentions field-for-field
(entity_group, word, start, end, score) in text order — the reference
response contract (main_endpoints.py:129-143).
"""

import pytest

from pg_iui_ner_api_spark import synth
from pg_iui_ner_api_spark.operators import ner

from .oracle import oracle_mentions, oracle_spans

N_DOCS = 120


@pytest.fixture(scope="module")
def docs_df(spark):
    return synth.synth_documents(spark, N_DOCS, partitions=4).cache()


def test_span_sequence_identity(spark, docs_df):
    back = ner.reassemble_spans(docs_df)
    orig = {r["doc_id"]: r["spans"] for r in docs_df.collect()}
    got = {r["doc_id"]: r["spans"] for r in back.collect()}
    assert set(orig) == set(got)
    for doc_id, spans in orig.items():
        o = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        g = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got[doc_id]]
        assert o == g, f"span sequence mismatch for {doc_id}"


def test_spans_match_generator(docs_df):
    rows = {r["doc_id"]: r for r in docs_df.collect()}
    for i in range(N_DOCS):
        doc, _ = synth.gen_doc(i)
        got = rows[doc["doc_id"]]
        assert oracle_spans(doc) == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got["spans"]
        ]


def test_mention_parity_vs_oracle(spark, docs_df):
    eng = (
        ner.mentions_of(ner.extract(docs_df))
        .orderBy("doc_id", "span_idx", "start")
        .collect()
    )
    by_span = {}
    for r in eng:
        by_span.setdefault((r["doc_id"], r["span_idx"]), []).append(r)

    checked = 0
    for i in range(N_DOCS):
        doc, _ = synth.gen_doc(i)
        for si, span in enumerate(doc["spans"]):
            if span["kind"] != "text":
                assert (doc["doc_id"], si) not in by_span  # media spans yield nothing
                continue
            want = oracle_mentions(span["text"])
            got = by_span.get((doc["doc_id"], si), [])
            assert len(got) == len(want), (doc["doc_id"], si, span["text"])
            for g, w in zip(got, want):
                assert g["entity_group"] == w["entity_group"]
                assert g["word"] == w["word"]
                assert g["start"] == w["start"]
                assert g["end"] == w["end"]
                assert abs(g["score"] - w["score"]) < 1e-6
                assert g["sentence_id"] == w["sentence_id"]
                checked += 1
    assert checked > 200  # corpus actually exercised the path


def test_media_spans_pass_through_untouched(spark, docs_df):
    import pyspark.sql.functions as F

    media = (
        docs_df.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") != "text")
        .select("doc_id", "s.kind", "s.text", "s.media_ref")
        .collect()
    )
    assert len(media) > 0
    for r in media:
        assert r["kind"] in ("image", "audio")
        assert r["text"] == ""
        assert r["media_ref"].startswith("media://")


def test_long_text_truncation_vs_full():
    """Parity mode drops matches past the 512th token (the reference's
    silent truncation); 'full' mode keeps them (SURVEY §4 flag)."""
    from pg_iui_ner_api_spark.operators.tagger import GazetteerTagger

    filler = "pad " * 600  # 600 tokens of padding
    text = "Curie met Turing. " + filler + " Hopper works for Globex."
    trunc, _ = GazetteerTagger().tag(text)
    full, _ = GazetteerTagger(long_text="full").tag(text)
    assert {m.word for m in trunc} == {"Curie", "Turing"}
    assert {m.word for m in full} == {"Curie", "Turing", "Hopper", "Globex"}
    # prefixes agree exactly
    assert [m.word for m in full[: len(trunc)]] == [m.word for m in trunc]


def test_tag_batch_matches_per_row_tag(spark, docs_df):
    """The vectorized batch tagger (GazetteerTagger.tag_batch — blob
    concat + one regex pass + searchsorted row mapping) must emit
    byte-identical rows IN THE SAME ORDER as the per-row tag() loop,
    including truncation, sentence ids, ctx clipping and NaN pred
    scores."""
    import math

    import pandas as pd

    from pg_iui_ner_api_spark.operators import ner as N
    from pg_iui_ner_api_spark.operators.tagger import GazetteerTagger

    pdf = N.explode_text_spans(docs_df).toPandas()
    # adversarial extras: empty text, no-match text, >512-token text with
    # a post-cutoff entity, multi-sentence text, punctuation edges
    filler = "pad " * 600
    extra = pd.DataFrame({
        "doc_id": [f"x{i}" for i in range(5)],
        "span_idx": [0] * 5,
        "text": [
            "",
            "nothing to see here",
            "Curie met Turing. " + filler + " Hopper works for Globex.",
            "Curie met Turing. Turing works for Initech. Hopper!",
            "  Curie...Turing?! ",
        ],
    })
    pdf = pd.concat([pdf, extra], ignore_index=True)

    for tg in (GazetteerTagger(), GazetteerTagger(long_text="full")):
        for lo in range(0, len(pdf), 512):
            chunk = pdf.iloc[lo:lo + 512].reset_index(drop=True)
            got = tg.tag_batch(chunk)
            rows = []
            for doc_id, span_idx, text in zip(
                chunk["doc_id"], chunk["span_idx"], chunk["text"]
            ):
                mentions, preds = tg.tag(text)
                rows += [
                    (doc_id, span_idx, "mention", m.entity_group, m.word,
                     m.start, m.end, m.score, m.sentence_id, m.ctx)
                    for m in mentions
                ]
                rows += [
                    (doc_id, span_idx, "pred", None, p.pred, p.start, p.end,
                     float("nan"), p.sentence_id, None)
                    for p in preds
                ]
            if got is None:
                assert rows == []
                continue
            assert len(got) == len(rows)
            for want, have in zip(rows, got.itertuples(index=False)):
                for w, h in zip(want, tuple(have)):
                    if isinstance(w, float) and math.isnan(w):
                        assert isinstance(h, float) and math.isnan(h)
                    else:
                        assert w == h, (want, tuple(have))
