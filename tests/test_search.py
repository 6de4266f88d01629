"""BM25 search vs an independent pure-Python oracle."""

import math
import re

import pytest

from pg_iui_ner_api_spark.operators.search import bm25_scores, bm25_topk

DOCS = [
    (0, "spark shuffle join spark spark"),
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "Spark  SQL window functions and JOIN strategies"),
    (3, "an unrelated document about nothing in particular"),
    (4, "join join join join join join join join join join"),
    (5, "spark"),
]
TERMS = ["spark", "join"]
K1, B = 1.2, 0.75


def _py_bm25():
    toks = {
        d: re.sub(r"\s+", " ", t).strip().lower().split(" ") for d, t in DOCS
    }
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in TERMS}
    out = {}
    for d, v in toks.items():
        s = 0.0
        hit = False
        for t in sorted(TERMS):
            tf = v.count(t)
            hit = hit or tf > 0
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * len(v) / avgdl))
        if hit:
            out[d] = s
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_scores_match_python_oracle(docs_df):
    want = _py_bm25()
    got = {r["doc_id"]: r["score"] for r in
           bm25_scores(docs_df, TERMS, k1=K1, b=B).collect()}
    assert set(got) == set(want)          # only matching docs emitted
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)
    # more occurrences of a rarer term must not be beaten by a doc with
    # none of it: doc 0 (3x spark + no join) vs doc 3 (no match)
    assert 3 not in got


def test_bm25_topk_order_and_cutoff(docs_df):
    want = _py_bm25()
    order = sorted(want, key=lambda d: (-want[d], d))[:3]
    got = bm25_topk(docs_df, TERMS, k=3, k1=K1, b=B).collect()
    assert [r["doc_id"] for r in got] == order
    assert all(r["score"] == pytest.approx(round(want[r["doc_id"]], 6))
               for r in got)


def test_bm25_rejects_empty_query(docs_df):
    with pytest.raises(ValueError):
        bm25_scores(docs_df, [])


def test_tfidf_keywords_matches_python_reference(spark):
    import math
    from collections import Counter

    from pg_iui_ner_api_spark.operators.search import tfidf_keywords

    corpus = {
        1: "the cat sat on the mat",
        2: "the dog sat on the log",
        3: "cats and dogs and cats",
        4: "the the the",
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {
        (r["doc_id"], r["rn_term"])
        for r in tfidf_keywords(df, k=2)
        .selectExpr("doc_id", "term AS rn_term")
        .collect()
    }
    # independent reference
    tfs = {d: Counter(t.split()) for d, t in corpus.items()}
    dfreq = Counter(term for c in tfs.values() for term in c)
    n = len(corpus)
    want = set()
    for d, c in tfs.items():
        scored = sorted(
            ((round(tf * math.log(n / dfreq[t]), 6), t) for t, tf in c.items()),
            key=lambda x: (-x[0], x[1]),
        )
        want |= {(d, t) for _, t in scored[:2]}
    assert got == want


def test_tfidf_term_in_every_doc_scores_zero(spark):
    from pg_iui_ner_api_spark.operators.search import tfidf_keywords

    df = spark.createDataFrame(
        [(1, "common rare1"), (2, "common rare2")], "doc_id long, text string"
    )
    rows = {(r["term"]): r["score"] for r in tfidf_keywords(df, k=5).collect()}
    assert rows["common"] == 0.0
    assert rows["rare1"] > 0 and rows["rare2"] > 0


def test_inverted_index_postings_and_truncation(spark):
    from pg_iui_ner_api_spark.operators.search import build_inverted_index

    rows = [(i, "common " + (f"only{i}" if i < 3 else "tail tail")) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = {
        r["term"]: (r["df"], r["postings"], r["n_dropped"])
        for r in build_inverted_index(df, max_postings=4).collect()
    }
    # 'common' in all 6 docs -> capped at the 4 SMALLEST doc_ids
    assert idx["common"] == (6, [0, 1, 2, 3], 2)
    # in-row repeats ('tail tail') count once per doc
    assert idx["tail"] == (3, [3, 4, 5], 0)
    assert idx["only1"] == (1, [1], 0)


def test_inverted_index_single_term_shuffle(spark):
    """The wide shuffle must key on term and carry only (term, doc_id) —
    never the text column."""
    from pg_iui_ner_api_spark.operators.search import build_inverted_index

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = (
        build_inverted_index(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    exch = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(exch) == 1 and "term" in exch[0] and "text" not in exch[0]


def test_collocations_matches_python_reference(spark):
    import math
    from collections import Counter

    from pg_iui_ner_api_spark.operators.search import collocations

    texts = [
        "new york is big and new york is busy",
        "the cat and the dog like new york",
        "a cat a dog a cat",
        "single",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["w1"], r["w2"], r["c_ab"], r["pmi"])
        for r in collocations(df, min_count=2, k=10).collect()
    ]
    # reference
    uni, big = Counter(), Counter()
    for t in texts:
        ws = t.split()
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    nu, nb = sum(uni.values()), sum(big.values())
    ref = sorted(
        (
            (
                w1, w2, c,
                round(math.log((c * nu * nu) / (nb * uni[w1] * uni[w2])), 6),
            )
            for (w1, w2), c in big.items()
            if c >= 2
        ),
        key=lambda r: (-r[3], r[0], r[1]),
    )[:10]
    assert got == ref
    # 'new york' must outrank any 'a cat'-style frequent-word pair
    top_pairs = [(w1, w2) for w1, w2, _, _ in got[:2]]
    assert ("new", "york") in top_pairs


def test_collocations_single_token_docs_contribute_no_bigrams(spark):
    from pg_iui_ner_api_spark.operators.search import collocations

    df = spark.createDataFrame(
        [(1, "solo"), (2, "solo"), (3, "")], "doc_id long, text string"
    )
    assert collocations(df, min_count=1).count() == 0
