"""BPE vocabulary induction (operators/bpe.py) vs an independent
pure-Python BPE with the identical deterministic tie rule."""

from collections import Counter

import pytest

from pg_iui_ner_api_spark.operators import bpe as B

DOCS = [
    ("d1", "low lower lowest low low"),
    ("d2", "newer newest new new newer"),
    ("d3", "wider wide widest lower"),
    ("d4", "low low low newer"),
]


def _py_word_counts(docs, max_word_len=64):
    wc = Counter()
    for _, t in docs:
        for w in " ".join(t.lower().split()).split(" "):
            if w and len(w) <= max_word_len:
                wc[w] += 1
    return wc


def _py_bpe(docs, num_merges, min_count=2):
    wc = _py_word_counts(docs)
    syms = {w: list(w) for w in wc}
    merges = []
    for rank in range(num_merges):
        pairs = Counter()
        for w, ss in syms.items():
            for i in range(len(ss) - 1):
                pairs[(ss[i], ss[i + 1])] += wc[w]
        if not pairs:
            break
        # count DESC, left ASC, right ASC
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_count:
            break
        merges.append((rank, l, r, l + r, c))
        for w, ss in syms.items():
            out, i = [], 0
            for s in ss:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            syms[w] = out
    return merges, {w: (wc[w], syms[w]) for w in wc}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_bpe_merges_match_python(spark, docs_df):
    merges_df, seg_df = B.bpe_train(docs_df, num_merges=12)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in merges_df.orderBy("rank").collect()
    ]
    want_merges, want_seg = _py_bpe(DOCS, 12)
    assert got == want_merges
    got_seg = {
        r["word"]: (r["wc"], list(r["pieces"])) for r in seg_df.collect()
    }
    assert got_seg == want_seg


def test_bpe_learns_common_subwords(spark, docs_df):
    merges_df, seg_df = B.bpe_train(docs_df, num_merges=12)
    merged = {r["merged"] for r in merges_df.collect()}
    # 'low' occurs 7 times as prefix/word — its pieces must be learned
    assert "lo" in merged and "low" in merged
    vocab = {r["piece"]: r["total_count"] for r in B.bpe_vocab(seg_df).collect()}
    assert vocab["low"] >= 7


def test_bpe_early_stop_on_min_count(spark, docs_df):
    merges_df, _ = B.bpe_train(docs_df, num_merges=500, min_count=5)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in merges_df.orderBy("rank").collect()
    ]
    want, _ = _py_bpe(DOCS, 500, min_count=5)
    assert got == want
    assert 0 < len(got) < 500
    assert all(c >= 5 for *_, c in got)


def test_bpe_is_rerun_deterministic(spark, docs_df):
    a, _ = B.bpe_train(docs_df, num_merges=6)
    b, _ = B.bpe_train(docs_df, num_merges=6)
    assert a.collect() == b.collect()


def test_word_counts_drop_report(spark):
    long_word = "x" * 80
    df = spark.createDataFrame(
        [("d", f"short {long_word} short")], "doc_id string, text string"
    )
    kept = {r["word"] for r in B.word_counts(df).collect()}
    assert kept == {"short"}
    dropped = {(r["word"], r["wc"]) for r in B.dropped_words(df).collect()}
    assert dropped == {(long_word, 1)}


def test_encode_words_matches_training_segmentation(spark, docs_df):
    merges_df, seg_df = B.bpe_train(docs_df, num_merges=10)
    merges = [(r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()]
    words = seg_df.select("word")
    got = {r["word"]: list(r["pieces"])
           for r in B.encode_words(words, merges).collect()}
    want = {r["word"]: list(r["pieces"]) for r in seg_df.collect()}
    assert got == want


def test_encode_words_handles_oov_deterministically(spark, docs_df):
    merges_df, _ = B.bpe_train(docs_df, num_merges=10)
    merges = [(r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()]
    oov = spark.createDataFrame([("lowish",), ("zzz",)], "word string")
    got = {r["word"]: list(r["pieces"])
           for r in B.encode_words(oov, merges).collect()}

    def py_encode(w):
        ss = list(w)
        for l, r in merges:
            out = []
            for s in ss:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            ss = out
        return ss

    assert got == {"lowish": py_encode("lowish"), "zzz": py_encode("zzz")}


def test_bpe_token_count(spark, docs_df):
    merges_df, seg_df = B.bpe_train(docs_df, num_merges=10)
    pieces_per_word = {r["word"]: len(r["pieces"]) for r in seg_df.collect()}
    got = {r["doc_id"]: (r["n_words"], r["n_pieces"])
           for r in B.bpe_token_count(docs_df, merges_df).collect()}
    for d, t in DOCS:
        ws = [w for w in t.lower().split() if w]
        assert got[d] == (len(ws), sum(pieces_per_word[w] for w in ws))


def test_bpe_token_count_keeps_empty_docs(spark):
    df = spark.createDataFrame(
        [("d1", "low low"), ("d2", ""), ("d3", None)], "doc_id string, text string"
    )
    got = {r["doc_id"]: (r["n_words"], r["n_pieces"])
           for r in B.bpe_token_count(df, [("l", "o")]).collect()}
    assert got["d2"] == (0, 0) and got["d3"] == (0, 0)
    assert got["d1"] == (2, 4)  # 'low' -> ['lo', 'w'] twice


def test_encode_words_plan_stays_jvm(spark):
    df = spark.createDataFrame([("abc",)], "word string")
    plan = (
        B.encode_words(df, [("a", "b"), ("ab", "c")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
