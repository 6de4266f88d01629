"""Physical-plan regression tests: the scale-critical plan properties
(predicate pushdown, nested-schema pruning, broadcast joins, no Python
in JVM-only stages) asserted against explain output so they can't
silently regress."""

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark import synth
from pg_iui_ner_api_spark.operators import linking as L, media as M, ner as N


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("corpus") / "documents")
    synth.synth_documents(spark, 50, partitions=2).write.parquet(p)
    return p


def test_text_path_prunes_media_ref(spark, corpus_path):
    docs = spark.read.parquet(corpus_path)
    plan = _plan(N.explode_text_spans(docs))
    scan = [l for l in plan.splitlines() if "FileScan" in l]
    assert scan, plan
    # nested pruning: the text path must not read media_ref payload refs
    assert "media_ref" not in scan[0]
    assert "text" in scan[0] and "kind" in scan[0]


def test_media_path_prunes_text(spark, corpus_path):
    docs = spark.read.parquet(corpus_path)
    plan = _plan(M.media_spans(docs))
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    # media metadata path never reads the (huge at scale) text payload
    assert "text" not in scan.split("ReadSchema")[-1]
    assert "media_ref" in scan


def test_parquet_filter_pushdown(spark, tmp_path):
    p = str(tmp_path / "orders")
    spark.range(0, 1000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 7).alias("o_custkey")
    ).write.parquet(p)
    q = spark.read.parquet(p).where(F.col("o_orderkey") == 42)
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]" in plan


def test_candidate_join_is_broadcast(spark, corpus_path):
    docs = spark.read.parquet(corpus_path)
    mentions = N.mentions_of(N.extract(docs))
    linked = L.link_mentions(mentions, synth.alias_df(spark), synth.entity_emb_df(spark))
    plan = _plan(linked)
    assert "BroadcastHashJoin" in plan
    # dims are VALUES LocalRelations — no Python RDD scans anywhere
    assert "applySchemaToPythonRDD" not in plan


def test_extraction_is_the_only_python_crossing(spark, corpus_path):
    docs = spark.read.parquet(corpus_path)
    mentions = N.mentions_of(N.extract(docs))
    linked = L.link_mentions(mentions, synth.alias_df(spark), synth.entity_emb_df(spark))
    plan = _plan(linked)
    # the only Python crossings: the extraction mapInPandas and the
    # Arrow-vectorized rerank; never row-at-a-time BatchEvalPython
    assert plan.count("MapInPandas") == plan.count("MapInPandas extract_batch")
    assert "BatchEvalPython" not in plan
    assert plan.count("ArrowEvalPython") == 1


def test_whole_stage_codegen_covers_scan_filter(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(0, 1000).write.parquet(p)
    q = spark.read.parquet(p).where(F.col("id") > 10).select((F.col("id") * 2).alias("x"))
    # the "*(n)" prefix marks whole-stage-codegen spans in plan text
    assert "*(1)" in _plan(q)


def test_ivf_assign_cells_is_map_only(spark):
    """VERDICT r1 scale-killer: cell assignment must NOT shuffle the
    vector corpus. The argmin over a foldable centroid literal is a pure
    projection — zero Exchange anywhere in the plan."""
    from pg_iui_ner_api_spark.operators import ann as A

    vecs = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 7).cast("float") for i in range(16)]).alias("embedding"),
    )
    plan = _plan(A.assign_cells(vecs, dim=16, ncells=8))
    assert "Exchange" not in plan, plan


def test_linking_has_no_corpus_shuffle(spark, corpus_path):
    """Round-2 map-only linking: the mention table must NOT shuffle —
    no Exchange keyed on mention_id (round 1 paid a groupBy argmax +
    join-back there). Only the broadcast of the candidate dim and the
    tiny dim-side groupBy may exchange."""
    docs = spark.read.parquet(corpus_path)
    linked = L.link_mentions(
        N.mentions_of(N.extract(docs)), synth.alias_df(spark), synth.entity_emb_df(spark)
    )
    plan = _plan(linked)
    assert "hashpartitioning(mention_id" not in plan, plan


def test_shingle_scan_has_no_pushed_expression_filter(spark, tmp_path):
    """Regression pin for the InferFiltersFromGenerate blowup: a plain
    explode let pushdown substitute the whole tokenize+shingle
    expression into the parquet scan's DataFilters (re-running the regex
    per row in a single-split scan task). With explode_outer the scan
    must carry no regexp work."""
    from pg_iui_ner_api_spark.operators import dedup as D

    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four")],
        "doc_id long, text string",
    ).write.parquet(p)
    docs = spark.read.parquet(p)
    plan = _plan(D.shingle_table(docs, 3))
    scans = [l for l in plan.splitlines() if "FileScan" in l]
    assert scans, plan
    for s in scans:
        assert "regexp_replace" not in s and "split(" not in s, s


def test_spread_is_noop_when_already_parallel(spark):
    from pg_iui_ner_api_spark.functions.text import spread

    par = spark.sparkContext.defaultParallelism
    df = spark.range(1000, numPartitions=par)
    assert spread(df) is df
    narrow = spark.range(1000, numPartitions=1)
    assert spread(narrow).rdd.getNumPartitions() == par


def test_media_geometry_prunes_documents_scan(spark, tmp_path):
    """The table-derived media queries construct the span array from
    doc_id alone, so the documents scan must read ONLY doc_id (a plan
    that drags text/lang/source through the scan would read ~all of a
    100 TB table for a metadata query) and need no Exchange."""
    import __spark_entry__ as E

    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(1, "alpha", "en", "s", 5), (2, "beta", "pl", "s", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(p)
    for key in ("media_geometry", "media_resize_geom"):
        plan = _plan(E.queries()[key](spark, str(tmp_path)))
        assert "ReadSchema: struct<doc_id:bigint>" in plan, plan
        assert "Exchange" not in plan, plan


def test_asof_join_single_exchange(spark):
    """The union-window as-of join must shuffle ONCE on the join keys —
    the whole point of the union trick vs a join+argmax (which pays a
    join shuffle AND an aggregation shuffle)."""
    import datetime as dt

    from pg_iui_ner_api_spark.operators import analytics as A

    rows = [
        (i, i % 3, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), "click", 1.0)
        for i in range(30)
    ]
    ev = spark.createDataFrame(
        rows, schema=["event_id", "user_id", "ts", "event_type", "value"]
    )
    out = A.asof_join(
        ev, ev, ["user_id"], right_cols=["event_id"], tiebreak="event_id"
    )
    plan = _plan(out)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "user_id" in plan.split("Exchange hashpartitioning", 1)[1].splitlines()[0]


def test_range_join_is_equi_not_nested_loop(spark):
    """Bucket expansion must turn interval containment into an equi-join:
    no BroadcastNestedLoopJoin / CartesianProduct in the plan."""
    import datetime as dt

    from pyspark.sql import Row

    from pg_iui_ner_api_spark.operators import analytics as A

    iv = spark.createDataFrame(
        [Row(user_id=i % 3, iv_id=i, s_start=i * 100, s_end=i * 100 + 50) for i in range(10)]
    )
    pts = spark.createDataFrame(
        [
            Row(event_id=i, user_id=i % 3, ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i))
            for i in range(10)
        ]
    )
    plan = _plan(A.range_join(iv, pts, ["user_id"], bucket_seconds=600))
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "Join" in plan


def test_funnel_single_exchange_no_python(spark):
    """Funnel must be ONE shuffle (the user groupBy) with the whole step
    chain as in-row array algebra — no per-step joins, no Python."""
    import datetime as dt

    from pg_iui_ner_api_spark.operators import analytics as A

    rows = [
        (i, i % 5, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i),
         ["signup", "click", "purchase", "view"][i % 4])
        for i in range(40)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    plan = _plan(A.funnel(ev, ["signup", "click", "purchase"]))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan


def test_bm25_stays_jvm_side(spark):
    """BM25 term frequencies are in-row HOFs and the stats side is a
    broadcast: no Python eval, no token explode (Generate), and the
    stats join is a BroadcastNestedLoopJoin over ONE row."""
    from pg_iui_ner_api_spark.operators.search import bm25_scores

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i}") for i in range(20)], "doc_id long, text string"
    )
    plan = _plan(bm25_scores(docs, ["alpha", "beta"]))
    assert "EvalPython" not in plan, plan
    assert "Generate" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_profile_single_aggregation_pass(spark):
    """profile_table is one scan + one single-row aggregation: no wide
    Exchange (only the 1-row final agg), no Expand in approx mode."""
    from pg_iui_ner_api_spark.operators import analytics as A

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], "id long, s string"
    )
    plan = _plan(A.profile_table(df, approx=True))
    assert "Expand" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("FileScan") <= 1  # in-memory here, but no re-scan


# ---- r4 operator plan pins ------------------------------------------------


@pytest.fixture(scope="module")
def text_docs_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("textdocs") / "docs")
    spark.createDataFrame(
        [(f"d{i}", f"alpha beta gamma delta epsilon tok{i} " * 8)
         for i in range(40)],
        schema=["doc_id", "text"],
    ).repartition(spark.sparkContext.defaultParallelism).write.parquet(p)
    return p


def test_chunk_documents_is_map_only(spark, text_docs_path):
    """Chunking promises ZERO shuffles at any corpus size: tokens,
    window arithmetic and the chunk explode are all in-row Column
    algebra, composing with the surrounding pipeline's partitioning."""
    from pg_iui_ner_api_spark.operators.packing import chunk_documents

    plan = _plan(chunk_documents(spark.read.parquet(text_docs_path)))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan  # no Python on the hot path


def test_quality_score_is_map_only(spark, text_docs_path):
    """Hashed-BoW model scoring is a pure projection: broadcast-free,
    shuffle-free, Python-free — the 100 TB corpus never moves."""
    from pg_iui_ner_api_spark.operators.quality_model import (
        score_documents, seed_weights)

    plan = _plan(score_documents(
        spark.read.parquet(text_docs_path), seed_weights(64)))
    # spread() may widen a narrow input with a RoundRobin repartition
    # (a no-op at scale); hash/range shuffles and Python are forbidden
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_shuffle_corpus_single_hash_exchange(spark, text_docs_path):
    """Seeded global shuffle must be ONE hash shuffle on shard + per-
    shard sorts — never a global sort (Exchange rangepartitioning) or a
    single-partition window (Exchange SinglePartition), the two classic
    100 TB killers for 'shuffle the corpus'."""
    from pg_iui_ner_api_spark.operators.packing import shuffle_corpus

    plan = _plan(shuffle_corpus(spark.read.parquet(text_docs_path)))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_pq_topk_single_exchange_no_corpus_shuffle(spark):
    """ADC scoring joins the broadcast query table against the encoded
    corpus in place; the only shuffle carries the narrow (q_id, vec_id,
    acos) rows into the per-query top-k window — codes and embeddings
    never ride an Exchange."""
    from pg_iui_ner_api_spark.operators import pq as PQ

    dim, m = 8, 4
    vecs = spark.createDataFrame(
        [(f"v{i}", [float((i * 7 + j) % 5) for j in range(dim)])
         for i in range(30)],
        schema=["vec_id", "embedding"],
    )
    books = PQ.seed_codebooks(dim, m=m, ksub=4)
    enc = PQ.pq_encode(vecs, dim, m=m, ksub=4, codebooks=books)
    qs = spark.createDataFrame(
        [("q0", [1.0] * dim)], schema=["q_id", "q_emb"])
    plan = _plan(PQ.pq_topk(enc, qs, books, k=3))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan, plan


def test_negative_triples_no_cartesian(spark):
    """Negative sampling resolves replicas through broadcast joins on
    the <= `buckets`-row size table and equi-joins on the node index;
    the edge table must never enter a CartesianProduct."""
    from pg_iui_ner_api_spark.operators.negatives import negative_triples

    edges = spark.createDataFrame(
        [(f"s{i % 5}", "rel", f"o{i % 7}") for i in range(20)],
        schema=["subj", "pred", "obj"],
    )
    plan = _plan(negative_triples(edges, n_neg=2, buckets=8))
    assert "CartesianProduct" not in plan, plan


def test_lm_score_no_cartesian(spark, text_docs_path):
    """Bigram-LM scoring: count tables join back on hashed bigram keys
    (equi), the 1-row vocab total arrives via broadcast — no
    CartesianProduct anywhere."""
    from pg_iui_ner_api_spark.operators.lm import lm_score

    plan = _plan(lm_score(spark.read.parquet(text_docs_path)))
    assert "CartesianProduct" not in plan, plan


def test_adamic_adar_no_cartesian(spark):
    """Link prediction wedges come from an equi-self-join on the shared
    neighbor (hub-capped) — never an all-pairs product."""
    from pg_iui_ner_api_spark.operators.graph import adamic_adar

    edges = spark.createDataFrame(
        [(f"n{i % 6}", f"n{(i * 3 + 1) % 6}") for i in range(18)],
        schema=["src", "dst"],
    )
    plan = _plan(adamic_adar(edges))
    assert "CartesianProduct" not in plan, plan


def test_jaccard_link_no_cartesian(spark):
    """Jaccard wedges are the same equi-self-join; the two degree joins
    are narrow equi-joins — no all-pairs product anywhere."""
    from pg_iui_ner_api_spark.operators.graph import jaccard_link

    edges = spark.createDataFrame(
        [(f"n{i % 6}", f"n{(i * 3 + 1) % 6}") for i in range(18)],
        schema=["src", "dst"],
    )
    plan = _plan(jaccard_link(edges))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sssp_relax_joins_broadcast_frontier(spark):
    """Every Bellman-Ford round joins the materialized edge table
    against the BROADCAST frontier — the edge side never shuffles and
    the relax join is never a sort-merge. (The round function is the
    loop body of sssp; the loop itself checkpoints each round, hiding
    the join tree behind an RDD scan.)"""
    from pg_iui_ner_api_spark.operators.graph import _sssp_relax_round

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 2), (3, 4, 1), (1, 4, 9)], schema=["src", "dst", "w"]
    )
    dist = spark.createDataFrame([(1, 0)], schema=["node", "dist"])
    plan = _plan(_sssp_relax_round(edges, dist, dist))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_random_walks_no_cartesian_no_python(spark):
    """Each walk step is a degree lookup + a (node, idx) neighbor probe
    — equi-joins only, md5 chain computed JVM-side."""
    from pg_iui_ner_api_spark.operators.graph import random_walks, symmetrize

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], schema=["src", "dst"])
    plan = _plan(random_walks(symmetrize(edges), walk_len=2))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zorder_layout_single_range_exchange(spark):
    """Z-order clustering is ONE rangepartitioning exchange + an
    in-partition sort — never a global total sort of the payload."""
    from pg_iui_ner_api_spark.operators.layout import zorder_layout

    df = spark.range(100).select(
        (F.col("id") % 10).alias("x"), (F.col("id") % 7).alias("y")
    )
    plan = _plan(zorder_layout(df, "x", "y", partitions=4))
    assert plan.count("Exchange") == 1, plan
    assert "rangepartitioning" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_key_skew_is_take_ordered(spark):
    """Top-N heavy keys via TakeOrderedAndProject (map-side top-N), not
    a global sort of the distinct-key table."""
    from pg_iui_ner_api_spark.operators.analytics import key_skew

    df = spark.range(1000).select((F.col("id") % 50).alias("k"))
    plan = _plan(key_skew(df, "k", top_n=5))
    assert "TakeOrderedAndProject" in plan, plan


def test_tfidf_keywords_no_global_sort_no_python(spark):
    """Per-doc top-k windows partition by doc_id; the plan must contain
    no rangepartitioning (global sort) and no Python crossing."""
    from pg_iui_ner_api_spark.operators.search import tfidf_keywords

    df = spark.createDataFrame([(1, "a b c"), (2, "b c d")],
                               "doc_id long, text string")
    plan = _plan(tfidf_keywords(df, k=2))
    assert "rangepartitioning" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mad_outliers_broadcasts_group_stats(spark, sf_dir):
    """The input table must never sort-merge on the group key: both
    median and MAD dims join back as broadcasts. Parquet input gives
    the planner static size stats, so the broadcast choice is made at
    PLAN time — deterministic, unlike AQE's runtime conversion on
    in-memory relations, which races stage scheduling and made an
    earlier version of this pin order-flaky in the full suite."""
    from pg_iui_ner_api_spark.operators.analytics import mad_outliers

    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    plan = _plan(mad_outliers(events, "value", ["event_type"]))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_grouped_ols_single_aggregation_exchange(spark):
    """All six sufficient statistics accumulate in ONE partial-
    aggregable groupBy: exactly one Exchange, no Python."""
    from pg_iui_ner_api_spark.operators.analytics import grouped_ols

    df = spark.createDataFrame(
        [("g", float(i), float(i)) for i in range(10)],
        "grp string, x double, y double",
    )
    plan = _plan(grouped_ols(df, "x", "y", ["grp"]))
    assert plan.count("Exchange") == 1, plan
    assert plan.count("HashAggregate") == 2, plan  # partial + final
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_url_canonicalization_stays_jvm_side(spark):
    """URL canonicalization is pure Column algebra — a map-only plan
    with no Python and no Exchange."""
    from pg_iui_ner_api_spark.functions.web import canonicalize_url

    df = spark.createDataFrame([("http://a.com/x?b=1",)], "url string")
    plan = _plan(df.select(canonicalize_url("url").alias("c")))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cdc_chunks_is_map_only_jvm(spark, tmp_path):
    """CDC chunking must add ZERO exchanges (pure in-row algebra until
    the caller aggregates) and contain no Python."""
    from pg_iui_ner_api_spark.operators.dedup import cdc_chunks

    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "a b c d e f g h")], ["doc_id", "text"]
    ).write.parquet(p)
    plan = _plan(cdc_chunks(spark.read.parquet(p)))
    # the only allowed exchange is spread()'s round-robin parallelism
    # fan-out — never a KEYED shuffle (nothing groups/joins in-operator)
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan
    assert "Python" not in plan
    # the bounds projection boundary survived CollapseProject (else the
    # per-chunk element_at references re-hash every window)
    assert "AS bounds" in plan


def test_hits_shuffles_scores_not_edges(spark):
    """The HITS output plan must be Python-free, and its per-step joins
    must consume the checkpointed edge table (edges never re-derive
    through the iteration)."""
    from pg_iui_ner_api_spark.operators.graph import hits

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    plan = _plan(hits(e, iters=2))
    assert "Python" not in plan
    # every edge consumer is the one materialized checkpoint scan
    assert "Scan ExistingRDD" in plan


def test_rule_mining_plan_jvm_only(spark):
    from pg_iui_ner_api_spark.operators.rules import mine_path_rules

    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "q", "c"), ("a", "h", "c")],
        ["subj", "pred", "obj"],
    )
    plan = _plan(mine_path_rules(t, min_support=1, min_conf=0.0))
    assert "Python" not in plan
    # body distinct shuffles the hashed pair key, never raw entity ids:
    # the aggregate output carries xh/yh longs
    assert "xh" in plan and "yh" in plan
