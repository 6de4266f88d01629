"""Subword tokenize + label alignment (SURVEY.md M2).

Reproduces the reference's training-time alignment rule
(/root/reference/src/model/training.py:18-58) without the HF stack:
given a pre-split word sequence and per-word BIO tag ids, produce
per-subword labels where

  * the FIRST subword of a word carries the word's tag,
  * continuation subwords carry -100 (ignored by the loss),
  * special positions (CLS/SEP/padding) carry -100,
  * the sequence truncates at ``max_len`` subwords including specials
    (training.py:13,23-25 — the same 512 cap the NER decode replicates).

The subword splitter is pluggable: the default deterministic splitter
chunks words every ``piece_len`` characters (a stand-in with the same
segmentation SHAPE as a BPE tokenizer); HFTagger's fast tokenizer slots
in unchanged because the alignment rule only consumes word_ids.

This is the spec our span decode inverts — tests assert
round-trip consistency between align and the extraction decode.
"""

from __future__ import annotations

from ..schema import MAX_LEN

IGNORE = -100
CLS = "<s>"
SEP = "</s>"
PAD = "<pad>"


def default_subwords(word: str, piece_len: int = 4) -> list[str]:
    """Deterministic stand-in subword split: fixed-width chunks, with the
    HF-style continuation marker on non-initial pieces."""
    if len(word) <= piece_len:
        return [word]
    pieces = [word[i : i + piece_len] for i in range(0, len(word), piece_len)]
    return [pieces[0]] + ["##" + p for p in pieces[1:]]


def tokenize_and_align(
    words: list[str],
    tags: list[int],
    max_len: int = MAX_LEN,
    pad_to_max: bool = False,
    subwords=default_subwords,
) -> tuple[list[str], list[int]]:
    """(words, per-word tag ids) -> (subword tokens, per-subword labels).

    Mirrors training.py's tokenize_and_align_labels: word_ids drive the
    label mapping; truncation keeps the first max_len positions
    (specials included); optional padding to max_len with -100 labels
    (the reference pads to max_length, training.py:23-25).
    """
    if len(words) != len(tags):
        raise ValueError("words and tags must align")
    toks: list[str] = [CLS]
    labels: list[int] = [IGNORE]
    for word, tag in zip(words, tags):
        pieces = subwords(word)
        for k, p in enumerate(pieces):
            toks.append(p)
            labels.append(tag if k == 0 else IGNORE)
    toks.append(SEP)
    labels.append(IGNORE)
    if len(toks) > max_len:
        toks = toks[: max_len - 1] + [SEP]
        labels = labels[: max_len - 1] + [IGNORE]
    if pad_to_max:
        toks = toks + [PAD] * (max_len - len(toks))
        labels = labels + [IGNORE] * (max_len - len(labels))
    return toks, labels


def first_subword_tags(labels: list[int]) -> list[int]:
    """Inverse projection: the word-level tag sequence recovered from
    aligned labels (drops -100 positions) — the round-trip check."""
    return [l for l in labels if l != IGNORE]
