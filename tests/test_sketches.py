"""operators/sketches.py — exact heavy hitters (Misra-Gries candidates
+ verify pass) and mergeable HLL distinct sketches.

The heavy-hitter tests force the sketch's shrink path (vocabulary many
times larger than the counter budget k) and pin partition invariance —
the two properties the sf0.01 driver corpus (tiny vocab, never shrinks)
cannot exercise. The HLL tests pin merge invariance (register-wise max
commutes with grouping), both estimate regimes (linear counting below
2.5m, raw HLL far above it), and cross-engine register parity.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.operators.sketches import (
    heavy_hitters,
    hll_alpha_m2_scaled,
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def _skewed_docs(spark, n_docs=400, vocab=3000):
    """Deterministic Zipf-ish corpus: a handful of hot tokens woven
    through a long tail of (mostly unique) rare tokens, so the MG
    summary (k = den/num + 2) must shrink many times per partition."""
    rows = []
    for i in range(n_docs):
        toks = [f"hot{i % 3}", f"warm{i % 17}"]
        toks += [f"rare{(i * 7 + j) % vocab}" for j in range(10)]
        rows.append((f"d{i}", " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id string, text string")


def _brute_force(df, num, den):
    tok = df.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    )
    total = tok.count()
    return {
        (r.tok, r.cnt)
        for r in tok.groupBy("tok").agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") * den >= total * num).collect()
    }


def test_heavy_hitters_exact_under_shrink(spark):
    docs = _skewed_docs(spark)
    # each hot token is 1/36 of the stream, warm 1/204, rare ~unique;
    # k = 40 + 2 counters vs 3000-token vocabulary: the per-partition
    # summaries shrink constantly, yet the verified output stays exact
    got = {(r.tok, r.cnt) for r in heavy_hitters(docs, 1, 40).collect()}
    assert got == _brute_force(docs, 1, 40)
    assert any(t.startswith("hot") for t, _ in got)
    assert all(not t.startswith("rare") for t, _ in got)


def test_heavy_hitters_partition_invariant(spark):
    docs = _skewed_docs(spark, n_docs=200)
    one = {(r.tok, r.cnt)
           for r in heavy_hitters(docs.coalesce(1), 1, 36).collect()}
    many = {(r.tok, r.cnt)
            for r in heavy_hitters(docs.repartition(7), 1, 36).collect()}
    assert one == many == _brute_force(docs, 1, 36)
    assert one, "threshold should admit the hot tokens"


def test_heavy_hitters_empty_and_bad_args(spark):
    empty = spark.createDataFrame([], "doc_id string, text string")
    assert heavy_hitters(empty, 1, 10).count() == 0
    with pytest.raises(ValueError):
        heavy_hitters(empty, 0, 10)


def test_heavy_hitters_verify_join_is_broadcast(spark):
    plan = heavy_hitters(_skewed_docs(spark, 50), 1, 10)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def _vals(spark, n, card):
    return spark.range(n).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") % card).cast("string").alias("v"),
    )


def test_hll_linear_counting_regime(spark):
    # 600 distinct values per group << 2.5 * 4096: corrected estimate
    # (linear counting) lands within 5% of exact
    df = _vals(spark, 20_000, 2400)
    est = {r.g: r.est
           for r in hll_estimate(hll_sketch(df, ["g"], "v", p=12),
                                 p=12, corrected=True).collect()}
    exact = {r.g: r.n
             for r in df.groupBy("g").agg(
                 F.countDistinct("v").alias("n")).collect()}
    for g in exact:
        assert abs(est[g] - exact[g]) / exact[g] < 0.05, (g, est[g], exact[g])


def test_hll_raw_regime(spark):
    # ~25k distinct per group >> 2.5 * 256 with p=8: the raw HLL branch;
    # expected rel. error 1.04/sqrt(256) ~ 6.5%, assert a 3-sigma 20%
    df = _vals(spark, 200_000, 100_000)
    est = {r.g: r.est
           for r in hll_estimate(hll_sketch(df, ["g"], "v", p=8),
                                 p=8, corrected=True).collect()}
    exact = {r.g: r.n
             for r in df.groupBy("g").agg(
                 F.countDistinct("v").alias("n")).collect()}
    for g in exact:
        assert abs(est[g] - exact[g]) / exact[g] < 0.20, (g, est[g], exact[g])


def test_hll_merge_invariance(spark):
    # sketch at (g, sub) merged up to g == sketch built directly at g:
    # register-wise max commutes with any grouping, so sketch tables
    # can be rolled up without rescanning raw data
    df = _vals(spark, 30_000, 5000).withColumn(
        "sub", (F.col("v").cast("long") % 7).cast("string")
    )
    direct = {r.g: [(x.idx, x.rho) for x in r.regs]
              for r in hll_sketch(df, ["g"], "v", p=10).collect()}
    merged = {r.g: [(x.idx, x.rho) for x in r.regs]
              for r in hll_merge(
                  hll_sketch(df, ["g", "sub"], "v", p=10), ["g"]).collect()}
    assert direct == merged


def test_hll_registers_match_duckdb(spark):
    # bit-identical registers + raw estimate vs the DuckDB twin (same
    # md5-prefix hash, same integer harmonic sum, same inlined constant)
    df = _vals(spark, 5_000, 900)
    got = sorted(
        tuple(r) for r in hll_estimate(
            hll_sketch(df, ["g"], "v", p=12), p=12).collect()
    )
    c = hll_alpha_m2_scaled(12)
    want = sorted(tuple(r) for r in duckdb.sql(f"""
        WITH t AS (SELECT CAST(range % 4 AS VARCHAR) AS g,
                          CAST(range % 900 AS VARCHAR) AS v
                   FROM range(5000)),
        h AS (SELECT g, CAST(('0x' || substr(md5(v), 1, 15)) AS BIGINT) AS h
              FROM t),
        r AS (SELECT g, h % 4096 AS idx,
                     CASE WHEN (h >> 12) = 0 THEN 49
                          ELSE 49 - length(bin(h >> 12)) END AS rho
              FROM h),
        m AS (SELECT g, idx, max(rho) AS rho FROM r GROUP BY g, idx),
        a AS (SELECT g, count(*) AS nnz,
                     sum(1::BIGINT << (50 - rho)) AS s_set
              FROM m GROUP BY g)
        SELECT g, nnz, 4096 - nnz AS zeros,
               s_set + (4096 - nnz) * (1::BIGINT << 50) AS s50,
               round({c!r} / (s_set + (4096 - nnz) * (1::BIGINT << 50)), 4)
                   AS est
        FROM a
    """).fetchall())
    assert got == want


def test_hll_build_shuffles_only_registers(spark):
    # the (g, idx, rho) aggregation must partial-aggregate map-side:
    # a HashAggregate appears BELOW the first Exchange in the plan
    plan = hll_sketch(_vals(spark, 1000, 100), ["g"], "v", p=8)._jdf \
        .queryExecution().executedPlan().toString()
    first_exchange = plan.index("Exchange")
    assert "HashAggregate" in plan[first_exchange:]
    assert "HashAggregate" in plan[:first_exchange] or \
        "partial" in plan[:first_exchange].lower()


def test_hll_set_algebra(spark):
    from pg_iui_ner_api_spark.operators.sketches import (
        hll_intersect_estimate, hll_union_col)

    # A = 0..7999, B = 4000..13999: |A|=8000, |B|=10000, |A∪B|=14000,
    # |A∩B|=4000 — the sizable-overlap regime inclusion-exclusion is
    # specified for
    df = spark.range(14_000).select(F.col("id").cast("string").alias("v"))
    a = hll_sketch(
        df.where(F.col("v").cast("long") < 8000).selectExpr("'k' AS k", "v"),
        ["k"], "v", p=12,
    ).withColumnRenamed("regs", "ra")
    b = hll_sketch(
        df.where(F.col("v").cast("long") >= 4000).selectExpr("'k' AS k", "v"),
        ["k"], "v", p=12,
    ).withColumnRenamed("regs", "rb")
    r = hll_intersect_estimate(a.join(b, "k"), "ra", "rb", p=12).first()
    for est, true in ((r.est_a, 8000), (r.est_b, 10000),
                      (r.est_union, 14000)):
        assert abs(est - true) / true < 0.05, (est, true)
    # intersection inherits both estimates' errors: 10% tolerance
    assert abs(r.est_intersect - 4000) / 4000 < 0.10, r.est_intersect

    # union of sketches == sketch of the union, register-exact
    direct = hll_sketch(df.selectExpr("'k' AS k", "v"), ["k"], "v",
                        p=12).first().regs
    via = a.join(b, "k").select(
        hll_union_col(F.col("ra"), F.col("rb")).alias("u")).first().u
    assert [tuple(x) for x in direct] == [tuple(x) for x in via]


def test_null_inputs(spark):
    # NULL text rows must be skipped by the sketch pass (not crash the
    # Arrow boundary) and contribute no tokens to the verify pass
    docs = spark.createDataFrame(
        [("d0", "a a b"), ("d1", None), ("d2", "a b c")],
        "doc_id string, text string",
    )
    got = {(r.tok, r.cnt) for r in heavy_hitters(docs, 1, 3).collect()}
    assert got == {("a", 3), ("b", 2)}

    # NULL values must not poison HLL registers (COUNT DISTINCT ignores
    # NULLs): estimate over {x, NULL, y} == estimate over {x, y}
    df = spark.createDataFrame(
        [("g", "x"), ("g", None), ("g", "y")], "g string, v string"
    )
    withnull = hll_estimate(hll_sketch(df, ["g"], "v", p=8), p=8,
                            corrected=True).first()
    clean = hll_estimate(
        hll_sketch(df.where(F.col("v").isNotNull()), ["g"], "v", p=8),
        p=8, corrected=True,
    ).first()
    assert withnull.est == clean.est and withnull.nnz == 2
