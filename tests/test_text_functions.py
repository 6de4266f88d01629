"""Text-analysis column function tests against Python oracles."""

import re

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.functions import text as T

ROWS = [
    (0, "The quick brown fox, and the lazy dog!!"),
    (1, "  spaced    out\ttabs\nand newlines  "),
    (2, "short"),
    (3, "el gato y la casa de madera que vimos ayer"),
    (4, "a" * 50 + " " + "b" * 3),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_token_count(df):
    got = {r["doc_id"]: r["n"] for r in
           df.select("doc_id", T.token_count(F.col("text")).alias("n")).collect()}
    for i, t in ROWS:
        assert got[i] == len([x for x in re.split(r"\s+", t.strip()) if x]), i


def test_bpe_piece_count(df):
    got = {r["doc_id"]: r["n"] for r in
           df.select("doc_id", T.bpe_ish_piece_count(F.col("text")).alias("n")).collect()}
    for i, t in ROWS:
        toks = [x for x in re.split(r"\s+", t.strip()) if x]
        want = sum(max(1, -(-len(x) // 4)) for x in toks)
        assert got[i] == want, i


def test_normalize_and_fingerprint(df):
    import hashlib

    got = {r["doc_id"]: r["fp"] for r in
           df.select("doc_id", T.fingerprint(F.col("text")).alias("fp")).collect()}
    for i, t in ROWS:
        norm = re.sub(r"\s+", " ", t).strip().lower()
        assert got[i] == hashlib.md5(norm.encode()).hexdigest(), i


def test_punct_ratio_bounds(df):
    rows = df.select("doc_id", T.punct_ratio(F.col("text")).alias("p")).collect()
    for r in rows:
        assert 0.0 <= r["p"] <= 1.0
    by_id = {r["doc_id"]: r["p"] for r in rows}
    assert by_id[0] > 0.0  # has punctuation
    assert by_id[2] == 0.0


def test_quality_score_range_and_signal(df):
    by_id = {r["doc_id"]: r["q"] for r in
             df.select("doc_id", T.quality_score(F.col("text")).alias("q")).collect()}
    assert all(0.0 <= q <= 1.0 for q in by_id.values())
    # a 1-token doc fails the length band; a 10+-token clean doc scores higher
    assert by_id[3] > by_id[2]


def test_shingles_contents(df):
    got = {r["doc_id"]: set(r["sh"]) for r in
           df.select("doc_id", T.shingles(F.col("text"), 3).alias("sh")).collect()}
    t = ROWS[3][1]
    toks = t.split()
    want = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    assert got[3] == want
    assert got[2] == {"short"}


def test_portable_hash64_matches_duckdb(df):
    import duckdb

    got = {r["doc_id"]: r["h"] for r in
           df.select("doc_id", T.portable_hash64(F.col("text")).alias("h")).collect()}
    con = duckdb.connect()
    for i, t in ROWS:
        want = con.execute(
            "SELECT CAST(('0x' || substr(md5(?),1,15)) AS BIGINT)", [t]
        ).fetchone()[0]
        assert got[i] == want, i


# ---------------------------------------------------------------------------
# curation ops: PII scrub, repetition profile, deterministic splits
# ---------------------------------------------------------------------------
PII_ROWS = [
    (0, "write bob.smith+x@corp.example.org today"),
    (1, "docs at https://ex.co/a?b=1#frag then text"),
    (2, "call +48 22 555 0199 now"),
    (3, "digits 123456789 inside prose"),          # aggressive phone mask
    (4, "clean text with no identifiers at all"),
    (5, "x@y.io https://a.b/c +1 555 123 4567 x@y.io"),
]


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(PII_ROWS, "doc_id long, text string")


def test_scrub_pii_masks_each_category(pii_df):
    got = {r["doc_id"]: r["s"] for r in pii_df.select(
        "doc_id", T.scrub_pii(F.col("text")).alias("s")).collect()}
    assert got[0] == "write <EMAIL> today"
    assert got[1] == "docs at <URL> then text"
    assert got[2] == "call <PHONE> now"
    assert got[3] == "digits <PHONE> inside prose"
    assert got[4] == PII_ROWS[4][1]  # clean text untouched
    assert got[5] == "<EMAIL> <URL> <PHONE> <EMAIL>"


def test_pii_counts(pii_df):
    u, e, p = T.pii_counts(F.col("text"))
    got = {r["doc_id"]: (r["u"], r["e"], r["p"]) for r in pii_df.select(
        "doc_id", u.alias("u"), e.alias("e"), p.alias("p")).collect()}
    assert got[0] == (0, 1, 0)
    assert got[1] == (1, 0, 0)
    assert got[2] == (0, 0, 1)
    assert got[4] == (0, 0, 0)
    assert got[5] == (1, 2, 1)


def test_dup_segment_fraction(spark):
    rows = [
        (0, "a\nb\na\n\n a "),      # segs [a,b,a,a] -> 2 dup of 4
        (1, "x\ny\nz"),             # all distinct
        (2, ""),                    # no segments
        (3, "same\nsame\nsame"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["f"] for r in df.select(
        "doc_id", T.dup_segment_fraction(F.col("text")).alias("f")).collect()}
    assert got[0] == pytest.approx(0.5)
    assert got[1] == 0.0
    assert got[2] == 0.0
    assert got[3] == pytest.approx(round(2 / 3, 6))


def test_top_ngram_stats_vs_python(spark):
    from collections import Counter

    rows = [
        (0, "a b a b a b c"),       # bigrams: ab x3, ba x2, bc x1
        (1, "one two three four"),  # all distinct
        (2, "solo"),                # no bigrams
        (3, ""),                    # no tokens
        (4, "w w w w"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in
           T.top_ngram_stats(df, "text", "doc_id", n=2).collect()}
    for i, t in rows:
        toks = [x for x in re.split(r"\s+", t.strip().lower()) if x]
        grams = [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)]
        top = max(Counter(grams).values()) if grams else 0
        g = got[i]
        assert g["n_tokens"] == len(toks), i
        assert g["n_grams"] == len(grams), i
        assert g["top_count"] == top, i
        assert g["top_fraction"] == pytest.approx(
            round(top / max(len(grams), 1), 6)), i
        dups = len(toks) - len(set(toks))
        assert g["dup_token_fraction"] == pytest.approx(
            round(dups / max(len(toks), 1), 6)), i


def test_dataset_split_deterministic_and_proportional(spark):
    df = spark.createDataFrame([(i,) for i in range(4000)], "doc_id long")
    out = df.select(
        "doc_id",
        T.split_bucket(F.col("doc_id")).alias("b"),
        T.dataset_split(F.col("doc_id")).alias("s"),
    )
    rows = {r["doc_id"]: (r["b"], r["s"]) for r in out.collect()}
    again = {r["doc_id"]: (r["b"], r["s"]) for r in out.collect()}
    assert rows == again  # stable across executions
    from collections import Counter

    frac = Counter(s for _, s in rows.values())
    assert set(frac) == {"train", "dev", "test"}
    assert frac["train"] / 4000 == pytest.approx(0.90, abs=0.02)
    assert frac["dev"] / 4000 == pytest.approx(0.05, abs=0.012)
    assert frac["test"] / 4000 == pytest.approx(0.05, abs=0.012)
    for _, (b, s) in rows.items():
        want = "train" if b < 9000 else ("dev" if b < 9500 else "test")
        assert s == want


def test_stratified_threshold_rounds_not_truncates(spark):
    """int(0.57*10000) truncates float error to 5699 — thresholds must
    round so a frac of k/buckets keeps exactly the first k buckets."""
    from pg_iui_ner_api_spark.functions.text import stratified_keep

    df = spark.createDataFrame([(i,) for i in range(20000)], "doc_id long")
    keep = df.select(
        T.split_bucket(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
        .alias("b"),
        stratified_keep(
            F.col("doc_id"), F.lit("x"), {"x": 0.57}, default_frac=0.0
        ).alias("k"),
    ).collect()
    assert all((r["b"] < 5700) == r["k"] for r in keep)
    # dataset_split boundaries likewise round (0.57/0.29 both truncate)
    s = T.dataset_split(F.col("doc_id"), train=0.57, dev=0.29)
    rows = df.select(T.split_bucket(F.col("doc_id")).alias("b"), s.alias("s")).collect()
    for r in rows:
        want = "train" if r["b"] < 5700 else ("dev" if r["b"] < 8600 else "test")
        assert r["s"] == want


def test_stratified_keep_deterministic_and_proportional(spark):
    from pg_iui_ner_api_spark.functions.text import stratified_keep
    from pyspark.sql import functions as F

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    pred = stratified_keep(
        F.col("doc_id"), F.col("stratum"), {"a": 0.5, "b": 0.1}, default_frac=0.9
    )
    kept1 = {r["doc_id"] for r in df.where(pred).collect()}
    # deterministic: same predicate over a repartitioned frame -> same set
    kept2 = {r["doc_id"] for r in df.repartition(7).where(pred).collect()}
    assert kept1 == kept2
    # append-stable: a doc's fate is unchanged when the corpus grows
    bigger = spark.createDataFrame(
        rows + [(i, "a") for i in range(3000, 6000)], "doc_id long, stratum string"
    )
    kept3 = {r["doc_id"] for r in bigger.where(pred).collect()}
    assert kept1 == {d for d in kept3 if d < 3000}
    # proportions land near the per-stratum fractions
    per = {s: sum(1 for d in kept1 if d % 3 == i) / 1000
           for i, s in enumerate(["a", "b", "c"])}
    assert abs(per["a"] - 0.5) < 0.06
    assert abs(per["b"] - 0.1) < 0.04
    assert abs(per["c"] - 0.9) < 0.04


def test_corpus_report_matches_python_reference(spark):
    from pg_iui_ner_api_spark.functions.text import corpus_report

    rows = [
        ("a", "en", "one two three four five six seven eight nine ten eleven"),
        ("a", "en", "short doc"),
        ("a", "de", "!!! ??? ***"),
        ("b", "fr", " ".join(f"w{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, "source string, lang string, text string")
    got = {r["source"]: r for r in corpus_report(df, short_tokens=20).collect()}

    a = got["a"]
    assert (a["n_docs"], a["n_tokens"]) == (3, 11 + 2 + 3)
    assert a["pct_short"] == round(3 / 3, 6)
    assert (a["n_langs"], a["top_lang"]) == (2, "en")
    assert a["avg_tokens"] == round(16 / 3, 6)
    b = got["b"]
    assert (b["n_docs"], b["n_tokens"], b["pct_short"]) == (1, 30, 0.0)
    # quality: b is 30 clean tokens -> len_ok 1, punct 0 -> quality 1.0
    assert b["avg_quality"] == 1.0


def test_corpus_report_top_lang_tie_breaks_ascending(spark):
    from pg_iui_ner_api_spark.functions.text import corpus_report

    rows = [("s", "fr", "x y z"), ("s", "de", "x y z")]
    df = spark.createDataFrame(rows, "source string, lang string, text string")
    assert corpus_report(df).collect()[0]["top_lang"] == "de"
