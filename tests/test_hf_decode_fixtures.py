"""Adversarial decode fixtures replicating real RoBERTa fast-tokenizer
offset-mapping shapes (VERDICT r1 gap: the subword-offset edge cases of
``pipeline('ner', aggregation_strategy="simple")`` —
/root/reference/src/routers/main_endpoints.py:166-176 — were untested).

torch/transformers are absent in this container, so these are STATIC
fixtures hand-built from the documented byte-level-BPE behavior of
RobertaTokenizerFast (offsets trimmed of the leading 'Ġ' space by the
default ByteLevel(trim_offsets=True) post-processor; punctuation split
into its own tokens; rare words split mid-word into subword pieces;
specials <s>/</s> mapped to (0, 0); truncation at max_length keeps the
leading tokens and re-appends </s>). Each fixture carries the FULL
offset mapping including specials, so the alignment seam
(tagger.align_offsets_to_probs) is exercised exactly as HFTagger.tag
drives it.
"""

import numpy as np
import pytest

from pg_iui_ner_api_spark.operators.bio_decode import decode_bio_simple
from pg_iui_ner_api_spark.operators.tagger import align_offsets_to_probs
from pg_iui_ner_api_spark.schema import LABEL2ID

NL = len(LABEL2ID)


def _probs(tags, p=0.9):
    """One (n, 9) row per tag name; argmax==tag with prob p, rest uniform."""
    out = np.full((len(tags), NL), (1 - p) / (NL - 1), dtype=np.float64)
    for i, t in enumerate(tags):
        out[i, LABEL2ID[t]] = p
    return out


def _decode(text, mapping, tags, scores=None):
    """Run the exact HFTagger seam: full mapping (incl. specials) ->
    align -> decode."""
    probs = _probs(tags)
    if scores is not None:
        for i, (t, s) in enumerate(zip(tags, scores)):
            probs[i, :] = (1 - s) / (NL - 1)
            probs[i, LABEL2ID[t]] = s
    offsets, kept = align_offsets_to_probs(mapping, probs)
    return decode_bio_simple(text, offsets, kept)


def test_punctuation_run_offsets():
    # "Acme Corp.. opened!!"  — byte-BPE splits each '.'/'!' into its own
    # token with 1-char offsets; trim_offsets excludes leading spaces.
    text = "Acme Corp.. opened!!"
    mapping = [(0, 0),            # <s>
               (0, 4),            # 'Acme'
               (5, 9),            # 'ĠCorp' (trimmed -> 5)
               (9, 10), (10, 11),  # '.' '.'
               (12, 18),          # 'Ġopened'
               (18, 19), (19, 20),  # '!' '!'
               (0, 0)]            # </s>
    # probs rows must match mapping rows: specials get O rows
    full_tags = ["O", "B-ORG", "I-ORG", "O", "O", "O", "O", "O", "O"]
    spans = _decode(text, mapping, full_tags)
    assert [(s.entity_group, s.word, s.start, s.end) for s in spans] == [
        ("ORG", "Acme Corp", 0, 9)
    ]


def test_midword_subword_entity_switch():
    # 'Warsawian' -> pieces 'Wars'/'aw'/'ian'; the model flips type
    # mid-word: I-PER after a LOC group starts a NEW group (HF "simple"
    # treats orphan/mismatched I-X as a start), splitting inside a word.
    text = "Warsawian"
    mapping = [(0, 0), (0, 4), (4, 6), (6, 9), (0, 0)]
    full_tags = ["O", "B-LOC", "I-LOC", "I-PER", "O"]
    spans = _decode(text, mapping, full_tags)
    assert [(s.entity_group, s.word, s.start, s.end) for s in spans] == [
        ("LOC", "Warsaw", 0, 6),
        ("PER", "ian", 6, 9),
    ]


def test_orphan_I_at_sequence_start():
    text = "Smith arrived"
    mapping = [(0, 0), (0, 5), (6, 13), (0, 0)]
    full_tags = ["O", "I-PER", "O", "O"]  # orphan I-PER: acts like B-PER
    spans = _decode(text, mapping, full_tags)
    assert [(s.entity_group, s.word) for s in spans] == [("PER", "Smith")]


def test_midsequence_zero_width_special_keeps_alignment():
    """A (0,0) entry in the MIDDLE of the mapping (pair encoding /
    normalization artifact). Round 1's positional slice
    probs[1:1+len(offsets)] shifts every later row by one here; the
    index-aligned seam must keep (offset, prob) rows paired."""
    text = "Acme hired Smith"
    mapping = [(0, 0),   # <s>
               (0, 4),   # 'Acme'
               (5, 10),  # 'Ġhired'
               (0, 0),   # mid-sequence zero-width special
               (11, 16),  # 'ĠSmith'
               (0, 0)]   # </s>
    full_tags = ["O", "B-ORG", "O", "O", "B-PER", "O"]
    spans = _decode(text, mapping, full_tags)
    assert [(s.entity_group, s.word, s.start, s.end) for s in spans] == [
        ("ORG", "Acme", 0, 4),
        ("PER", "Smith", 11, 16),
    ]
    # regression proof: the old positional slice mispairs this fixture
    probs = _probs(full_tags)
    offsets_by_value = [o for o in mapping if o != (0, 0)]
    sliced = probs[1:1 + len(offsets_by_value)]  # round-1 logic
    old = decode_bio_simple(text, offsets_by_value, sliced)
    assert [(s.entity_group, s.word) for s in old] != [
        ("ORG", "Acme"), ("PER", "Smith")
    ]


def test_truncation_boundary_cuts_entity():
    """max_length truncation keeps leading tokens; an entity spanning
    the cut ends at the last kept token (reference parity:
    training.py:13,23-25 truncates silently)."""
    max_len = 16  # scaled-down stand-in for 512; same code path
    words = [f"w{i}" for i in range(20)]
    text = " ".join(words)
    starts, pos = [], 0
    for w in words:
        starts.append(pos)
        pos += len(w) + 1
    # full mapping would be 22 tokens; truncation keeps <s> + 14 + </s>
    kept = max_len - 2
    mapping = [(0, 0)] + [(starts[i], starts[i] + len(words[i])) for i in range(kept)] + [(0, 0)]
    # entity covers words 12..17, but tokens >= 14 are truncated away
    full_tags = ["O"] + ["O"] * 12 + ["B-ORG", "I-ORG"] + ["O"]
    spans = _decode(text, mapping, full_tags)
    assert len(spans) == 1
    s = spans[0]
    assert s.entity_group == "ORG"
    assert s.start == starts[12] and s.end == starts[13] + len(words[13])
    assert s.word == f"{words[12]} {words[13]}"


def test_float32_mean_score_parity():
    """Group score is the float32 mean of token scores, matching the
    reference's np.float32 serialization (main_endpoints.py:170-175)."""
    text = "Acme Corp"
    mapping = [(0, 0), (0, 4), (5, 9), (0, 0)]
    full_tags = ["O", "B-ORG", "I-ORG", "O"]
    spans = _decode(text, mapping, full_tags, scores=[0.5, 0.91, 0.77, 0.5])
    assert len(spans) == 1
    assert spans[0].score == pytest.approx(
        float(np.float32(np.mean(np.array([0.91, 0.77], dtype=np.float32)))), abs=0
    )


def test_alignment_rejects_mismatched_rows():
    with pytest.raises(ValueError):
        align_offsets_to_probs([(0, 0), (0, 4)], np.zeros((3, NL)))
