"""BIO tag-sequence decode with HF-"simple" aggregation semantics.

This is the parity core of M1: the reference's output comes from
``pipeline('ner', aggregation_strategy="simple")``
(/root/reference/src/routers/main_endpoints.py:166-167), whose decode
contract is:

  1. per-token argmax over the 9-tag BIO space (models_utils.py:6-16);
     token score = probability of the argmax tag;
  2. grouping over the token sequence: a ``B-X`` token STARTS a group;
     an ``I-X`` token EXTENDS the running group iff its type X matches,
     otherwise it starts a new group (the HF "simple" rule — an
     orphan I-X behaves like B-X); ``O`` tokens close the group;
  3. per group: entity_group = X, score = float32 MEAN of token
     scores, start/end = char offsets of first/last token, word = the
     exact input substring text[start:end];
  4. groups are emitted in text order.

``HFTagger`` calls this on real logits; the gazetteer path is used to
cross-check it (tests build synthetic per-token probabilities from the
lexicon and assert both decoders emit identical spans).

Pure numpy over (n_tokens, 9) arrays — inside the extraction UDF this
runs once per Arrow batch element with no Python-level inner math.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..schema import ID2LABEL


@dataclass(frozen=True)
class Span:
    entity_group: str
    score: float
    word: str
    start: int
    end: int


def decode_bio_simple(
    text: str,
    token_offsets: list[tuple[int, int]],
    probs: np.ndarray,
) -> list[Span]:
    """(text, per-token char offsets, per-token tag probabilities) -> spans.

    ``probs`` has shape (n_tokens, 9) in the LABEL2ID order; rows need
    not be normalized (argmax + value reuse only, exactly what the
    reference pipeline consumes from softmax output).
    """
    n = len(token_offsets)
    if n == 0:
        return []
    if probs.shape != (n, len(ID2LABEL)):
        raise ValueError(f"probs shape {probs.shape} != ({n}, {len(ID2LABEL)})")
    tag_ids = np.argmax(probs, axis=1)
    scores = probs[np.arange(n), tag_ids]

    spans: list[Span] = []
    cur_type: str | None = None
    cur_scores: list[float] = []
    cur_start = cur_end = 0

    def flush():
        nonlocal cur_type
        if cur_type is not None:
            spans.append(
                Span(
                    entity_group=cur_type,
                    # float32 mean — the reference serializes np.float32
                    # scores (main_endpoints.py:170-175)
                    score=float(np.float32(np.mean(np.array(cur_scores, dtype=np.float32)))),
                    word=text[cur_start:cur_end],
                    start=cur_start,
                    end=cur_end,
                )
            )
        cur_type = None

    for i in range(n):
        label = ID2LABEL[int(tag_ids[i])]
        if label == "O":
            flush()
            continue
        prefix, etype = label.split("-", 1)
        if prefix == "I" and cur_type == etype:
            cur_end = token_offsets[i][1]
            cur_scores.append(float(scores[i]))
        else:
            # B-X always starts a group; orphan I-X starts one too
            flush()
            cur_type = etype
            cur_start, cur_end = token_offsets[i]
            cur_scores = [float(scores[i])]
    flush()
    return spans


def lexicon_probs(
    text: str,
    token_offsets: list[tuple[int, int]],
    matches: list[tuple[int, int, str, float]],
) -> np.ndarray:
    """Synthetic per-token probabilities from surface matches.

    ``matches`` rows are (start, end, entity_group, score) char spans.
    Tokens inside a match get B-/I- tags of the match's type with the
    match's score; all other tokens get O with probability 1. Used to
    cross-check decode_bio_simple against the regex span path.
    """
    from ..schema import LABEL2ID

    n = len(token_offsets)
    probs = np.zeros((n, len(LABEL2ID)), dtype=np.float64)
    probs[:, LABEL2ID["O"]] = 1.0
    for ms, me, group, score in matches:
        first = True
        for i, (ts, te) in enumerate(token_offsets):
            if ts >= ms and te <= me:
                tag = ("B-" if first else "I-") + group
                probs[i, :] = 0.0
                # leave headroom so argmax picks the tag decisively
                probs[i, LABEL2ID[tag]] = score
                first = False
    return probs
