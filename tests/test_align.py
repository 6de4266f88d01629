"""Tokenize+align (M2) tests — pure functions, no Spark session needed."""

from pg_iui_ner_api_spark.functions.align import (
    CLS,
    IGNORE,
    PAD,
    SEP,
    default_subwords,
    first_subword_tags,
    tokenize_and_align,
)


def test_basic_alignment():
    toks, labels = tokenize_and_align(["Alice", "works", "at", "Acme"], [1, 0, 0, 3])
    assert toks[0] == CLS and toks[-1] == SEP
    assert labels[0] == IGNORE and labels[-1] == IGNORE
    # 'Alice' -> 'Alic' + '##e': first piece gets tag 1, continuation -100
    assert toks[1] == "Alic" and labels[1] == 1
    assert toks[2] == "##e" and labels[2] == IGNORE
    assert first_subword_tags(labels) == [1, 0, 0, 3]


def test_roundtrip_preserves_word_tags():
    words = ["internationalization", "of", "Warsaw", "museums"]
    tags = [0, 0, 5, 0]
    _, labels = tokenize_and_align(words, tags)
    assert first_subword_tags(labels) == tags


def test_truncation_at_max_len():
    words = [f"w{i}" for i in range(600)]
    tags = [0] * 600
    toks, labels = tokenize_and_align(words, tags, max_len=512)
    assert len(toks) == len(labels) == 512
    assert toks[-1] == SEP and labels[-1] == IGNORE
    # tags beyond the cap are dropped — the same silent truncation the
    # reference applies (training.py:13,23-25)
    assert len(first_subword_tags(labels)) < 600


def test_padding():
    toks, labels = tokenize_and_align(["hi"], [0], max_len=16, pad_to_max=True)
    assert len(toks) == len(labels) == 16
    assert toks[-1] == PAD and labels[-1] == IGNORE


def test_subword_shape():
    assert default_subwords("cat") == ["cat"]
    assert default_subwords("catalog") == ["cata", "##log"]
    assert len(default_subwords("a" * 12)) == 3


def test_mismatched_lengths_raise():
    import pytest

    with pytest.raises(ValueError):
        tokenize_and_align(["a"], [0, 1])
