"""BIO decode (HF "simple" aggregation) tests — pure numpy, no Spark.

Includes the cross-check: synthetic token probabilities built from the
gazetteer lexicon must decode to EXACTLY the spans the regex-based
GazetteerTagger finds — two independent implementations agreeing on the
reference's aggregation contract."""

import re

import numpy as np
import pytest

from pg_iui_ner_api_spark.operators.bio_decode import (
    decode_bio_simple,
    lexicon_probs,
)
from pg_iui_ner_api_spark.operators.tagger import TOKEN_RE, GazetteerTagger
from pg_iui_ner_api_spark.schema import LABEL2ID

N_LABELS = len(LABEL2ID)


def _probs(tags_scores):
    """[(label, score), ...] -> (n, 9) prob matrix."""
    p = np.zeros((len(tags_scores), N_LABELS))
    for i, (label, score) in enumerate(tags_scores):
        p[i, LABEL2ID[label]] = score
        # spread remainder so rows sum to <= 1 without changing argmax
    return p


def test_basic_grouping():
    text = "Alice met Bob"
    offsets = [(0, 5), (6, 9), (10, 13)]
    spans = decode_bio_simple(
        text, offsets, _probs([("B-PER", 0.9), ("O", 0.8), ("B-PER", 0.7)])
    )
    assert [(s.entity_group, s.word, s.start, s.end) for s in spans] == [
        ("PER", "Alice", 0, 5),
        ("PER", "Bob", 10, 13),
    ]


def test_bi_continuation_merges_and_scores_average():
    text = "New York City"
    offsets = [(0, 3), (4, 8), (9, 13)]
    spans = decode_bio_simple(
        text, offsets, _probs([("B-LOC", 0.8), ("I-LOC", 0.6), ("I-LOC", 0.7)])
    )
    assert len(spans) == 1
    s = spans[0]
    assert s.word == "New York City" and s.entity_group == "LOC"
    assert s.score == pytest.approx(np.float32((0.8 + 0.6 + 0.7) / 3), abs=1e-6)


def test_b_after_b_splits():
    text = "Paris Berlin"
    offsets = [(0, 5), (6, 12)]
    spans = decode_bio_simple(text, offsets, _probs([("B-LOC", 0.9), ("B-LOC", 0.9)]))
    assert [s.word for s in spans] == ["Paris", "Berlin"]


def test_type_switch_mid_entity_splits():
    text = "Acme Paris"
    offsets = [(0, 4), (5, 10)]
    spans = decode_bio_simple(text, offsets, _probs([("B-ORG", 0.9), ("I-LOC", 0.9)]))
    assert [(s.entity_group, s.word) for s in spans] == [("ORG", "Acme"), ("LOC", "Paris")]


def test_orphan_I_starts_group():
    text = "x Curie"
    offsets = [(0, 1), (2, 7)]
    spans = decode_bio_simple(text, offsets, _probs([("O", 0.9), ("I-PER", 0.9)]))
    assert [(s.entity_group, s.word) for s in spans] == [("PER", "Curie")]


def test_empty_and_all_O():
    assert decode_bio_simple("", [], np.zeros((0, N_LABELS))) == []
    spans = decode_bio_simple("a b", [(0, 1), (2, 3)], _probs([("O", 1.0), ("O", 1.0)]))
    assert spans == []


def test_shape_mismatch_raises():
    with pytest.raises(ValueError):
        decode_bio_simple("ab", [(0, 2)], np.zeros((2, N_LABELS)))


def test_cross_check_vs_gazetteer_regex_path():
    tg = GazetteerTagger()
    texts = [
        "Marie Curie works for Acme Corp, the company.",
        "Globex, the conglomerate, is located in New York.",
        "Hopper met Turing yesterday. Turing won the Nobel Prize last year.",
        "Phoenix Systems acquired Umbrella Group, the pharma.",
        "Nothing to see here.",
    ]
    for text in texts:
        mentions, _ = tg.tag(text)
        offsets = [(m.start(), m.end()) for m in TOKEN_RE.finditer(text)]
        probs = lexicon_probs(
            text,
            offsets,
            [(m.start, m.end, m.entity_group, m.score) for m in mentions],
        )
        decoded = decode_bio_simple(text, offsets, probs)
        got = [(s.entity_group, s.word, s.start, s.end) for s in decoded]
        want = [(m.entity_group, m.word, m.start, m.end) for m in mentions]
        assert got == want, text
        # scores agree too: group mean of identical per-token scores
        for s, m in zip(decoded, mentions):
            assert s.score == pytest.approx(m.score, abs=1e-6)
