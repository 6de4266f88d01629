"""Sequence packing / shard export (operators/packing.py) vs a
brute-force Python oracle that re-implements concat-and-chunk with
plain loops and hashlib."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.operators.packing import pack_sequences, write_training_shards

CTX = 10
SHARDS = 3

DOCS = [
    (i, " ".join(f"w{j}" for j in range((i * 3) % 7 + 1))) for i in range(40)
]


def _h(doc_id):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)


def _brute(docs, ctx_len=CTX, n_shards=SHARDS):
    rows = [(did, _h(did), _h(did) % n_shards, len(text.split())) for did, text in docs]
    out = {}
    for shard in range(n_shards):
        cum = 0
        for did, h, s, nt in sorted((r for r in rows if r[2] == shard), key=lambda r: (r[1], r[0])):
            out[did] = (s, cum // ctx_len, cum % ctx_len, nt)
            cum += nt
    return out


def test_pack_sequences_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["shard"], r["pack_id"], r["offset_tokens"], r["n_tokens"])
           for r in pack_sequences(df, ctx_len=CTX, n_shards=SHARDS).collect()}
    assert got == _brute(DOCS)
    # packing is gapless: within each shard, offsets+lengths tile the stream
    by_shard = {}
    for did, (s, p, o, nt) in got.items():
        by_shard.setdefault(s, []).append((p * CTX + o, nt))
    for s, spans in by_shard.items():
        spans.sort()
        pos = 0
        for start, nt in spans:
            assert start == pos
            pos += nt


def test_pack_sequences_rejects_bad_params(spark):
    df = spark.createDataFrame(DOCS[:2], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_sequences(df, ctx_len=0)
    with pytest.raises(ValueError):
        pack_sequences(df, n_shards=0)


def test_write_training_shards_deterministic(spark, tmp_path):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(df, a, ctx_len=CTX, n_shards=SHARDS)
    write_training_shards(df, b, ctx_len=CTX, n_shards=SHARDS)

    def content(path):
        rows = spark.read.parquet(path).collect()
        return sorted((r["doc_id"], r["shard"], r["pack_id"], r["offset_tokens"],
                       r["n_tokens"], r["text"]) for r in rows)

    ca, cb = content(a), content(b)
    assert ca == cb and len(ca) == len(DOCS)
    # shard partition pruning: the filter lands in PartitionFilters, so a
    # training job reading one shard scans one directory
    one = spark.read.parquet(a).where(F.col("shard") == 1)
    plan = one._jdf.queryExecution().executedPlan().toString()
    import re
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "shard" in pf.group(1)


def test_write_path_is_one_shuffle(spark):
    # the export claim: text rides through the pack window, so the whole
    # write plan has exactly ONE Exchange (the window's shard hash
    # partitioning) beyond any input repartition
    from pg_iui_ner_api_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(DOCS, "doc_id long, text string").coalesce(4)
    packed = pack_sequences(df, ctx_len=CTX, n_shards=SHARDS, carry=("text",))
    plan = packed._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange")
    assert n_exchange == 1, plan
    assert "text" in packed.columns


def test_pack_sequences_null_text_is_zero_tokens(spark):
    from pg_iui_ner_api_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "d e")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["pack_id"], r["offset_tokens"], r["n_tokens"])
           for r in pack_sequences(df, ctx_len=4, n_shards=1).collect()}
    assert got[2][2] == 0                      # null text -> 0 tokens
    assert None not in {v for t in got.values() for v in t}
    # stream is still gapless across the null doc
    spans = sorted((p * 4 + o, nt) for p, o, nt in got.values())
    pos = 0
    for start, nt in spans:
        assert start == pos
        pos += nt


def test_shuffle_corpus_is_deterministic_permutation(spark):
    from pg_iui_ner_api_spark.operators.packing import shuffle_corpus

    docs = spark.range(500).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id")
    )
    a = shuffle_corpus(docs, seed="s1", n_shards=4).collect()
    b = shuffle_corpus(docs, seed="s1", n_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # rerun-stable
    # permutation: every doc exactly once
    assert len({r["doc_id"] for r in a}) == 500
    # positions are 1..count(shard) contiguous within each shard
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == {0, 1, 2, 3}
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_shuffle_corpus_seed_changes_order(spark):
    from pg_iui_ner_api_spark.operators.packing import shuffle_corpus

    docs = spark.range(300).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id")
    )
    a = {(r["doc_id"]): (r["shard"], r["pos"])
         for r in shuffle_corpus(docs, seed="s1", n_shards=4).collect()}
    b = {(r["doc_id"]): (r["shard"], r["pos"])
         for r in shuffle_corpus(docs, seed="s2", n_shards=4).collect()}
    assert a != b
    # and the shuffle actually breaks input order: doc ids sorted by
    # (shard, pos) must not be the sequential input order
    order = [d for d, _ in sorted(a.items(), key=lambda kv: kv[1])]
    assert order != sorted(order, key=lambda s: int(s[1:]))


def test_shuffle_corpus_no_global_single_partition_sort(spark):
    """The scale pin: the plan must sort WITHIN hash partitions (window
    per shard), never range-repartition to a global total order."""
    from pg_iui_ner_api_spark.operators.packing import shuffle_corpus

    docs = spark.range(100).select(F.col("id").cast("string").alias("doc_id"))
    plan = (
        shuffle_corpus(docs, seed="s1", n_shards=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" not in plan.lower(), plan
    assert "hashpartitioning(shard" in plan.lower(), plan


def _py_chunks(text, size, overlap):
    toks = [t for t in " ".join(text.lower().split()).split(" ") if t] if text else []
    n = len(toks)
    if n == 0:
        return []
    step = size - overlap
    n_chunks = 1 if n <= size else 1 + math.ceil((n - size) / step)
    out = []
    for i in range(n_chunks):
        s, e = i * step, min(i * step + size, n)
        out.append((i, s, e, e - s, " ".join(toks[s:e])))
    return out


def test_chunk_documents_matches_python(spark):
    from pg_iui_ner_api_spark.operators.packing import chunk_documents

    rows = [
        ("d0", ""),                                   # no chunks
        ("d1", None),                                 # no chunks
        ("d2", "one two three"),                      # single short chunk
        ("d3", " ".join(f"w{i}" for i in range(10))), # exactly size
        ("d4", " ".join(f"w{i}" for i in range(11))), # size+1 -> 2 chunks
        ("d5", " ".join(f"w{i}" for i in range(37))), # several, ragged tail
        ("d6", "  UPPER   Case\ttokens  here "),      # normalization
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {}
    for r in chunk_documents(df, size=10, overlap=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["tok_start"], r["tok_end"], r["n_tokens"],
             r["chunk_text"])
        )
    for d, t in rows:
        want = _py_chunks(t or "", 10, 3)
        assert sorted(got.get(d, [])) == want, d


def test_chunk_documents_covers_every_token_with_overlap(spark):
    from pg_iui_ner_api_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [("d", " ".join(f"w{i}" for i in range(101)))], "doc_id string, text string"
    )
    ch = sorted(
        (r["tok_start"], r["tok_end"])
        for r in chunk_documents(df, size=16, overlap=4).collect()
    )
    assert ch[0][0] == 0 and ch[-1][1] == 101
    for (s0, e0), (s1, e1) in zip(ch, ch[1:]):
        assert s1 == s0 + 12          # stride = size - overlap
        assert s1 < e0                # consecutive chunks overlap
    assert all(e - s <= 16 for s, e in ch)


def test_chunk_documents_is_map_only(spark):
    from pg_iui_ner_api_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([("d", "a b c")], "doc_id string, text string")
    plan = (
        chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunk_documents_rejects_bad_overlap(spark):
    from pg_iui_ner_api_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([("d", "a b")], "doc_id string, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, size=8, overlap=8)


# ---------------------------------------------------------------------------
# priority_sample: deterministic weighted sampling without replacement
# ---------------------------------------------------------------------------
def _py_priority(seed, doc_id, weight):
    """Independent python reference of the (seed, id) -> priority map."""
    h = int(hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:15], 16)
    u = float(h + 1) / 1152921504606846976.0
    return float(weight) / u


def test_priority_sample_matches_python_reference(spark):
    from pg_iui_ner_api_spark.operators.packing import priority_sample

    rows = [(i, float(10 + (i * 7) % 90)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = priority_sample(df, "w", k=25, seed="sX").collect()
    assert len(got) == 25
    want = sorted(
        ((_py_priority("sX", i, w), i, w) for i, w in rows), reverse=True
    )[:25]
    assert [(r["doc_id"], r["weight"]) for r in got] == [
        (i, w) for _, i, w in want
    ]
    for r in got:
        assert r["priority"] == round(_py_priority("sX", r["doc_id"], r["weight"]), 6)


def test_priority_sample_is_append_stable_and_partition_invariant(spark):
    from pg_iui_ner_api_spark.operators.packing import priority_sample

    rows = [(i, 1.0 + i % 5) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    base = [(r["doc_id"], r["priority"]) for r in priority_sample(df, "w", k=10).collect()]
    # partitioning must not change the selection
    re = [(r["doc_id"], r["priority"])
          for r in priority_sample(df.repartition(7), "w", k=10).collect()]
    assert base == re
    # appending rows never reshuffles existing priorities: the union's
    # top-k equals the top-k of (old priorities + new priorities)
    extra = [(1000 + i, 50.0) for i in range(5)]
    df2 = spark.createDataFrame(rows + extra, "doc_id long, w double")
    got2 = {r["doc_id"]: r["priority"] for r in priority_sample(df2, "w", k=10).collect()}
    for did, pr in base:
        if did in got2:
            assert got2[did] == pr


def test_priority_sample_drops_nonpositive_and_null_weights(spark):
    from pg_iui_ner_api_spark.operators.packing import priority_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "doc_id long, w double",
    )
    got = {r["doc_id"] for r in priority_sample(df, "w", k=10).collect()}
    assert got == {1, 5}


def test_priority_sample_favors_heavy_weights(spark):
    """Statistical sanity (deterministic given the seed): with one row
    1000x heavier than 999 others, it must be sampled at k=50."""
    from pg_iui_ner_api_spark.operators.packing import priority_sample

    rows = [(i, 1.0) for i in range(999)] + [(999, 1000.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r["doc_id"] for r in priority_sample(df, "w", k=50).collect()}
    assert 999 in got


# ---------------------------------------------------------------------------
# token_budget_select (quality-ranked per-source token budgets)
# ---------------------------------------------------------------------------
def _py_budget_select(rows, budgets, default):
    """Independent reference: per-source sort + sequential fill."""
    out = {}
    by_src = {}
    for rid, src, toks, q in rows:
        if src is None or toks is None or toks < 0:
            out[rid] = (None, None, False)
        else:
            by_src.setdefault(src, []).append((rid, toks, q))
    for src, items in by_src.items():
        b = budgets.get(src, default)
        items.sort(key=lambda t: (-(t[2] if t[2] is not None else float("-inf")), t[0]))
        cum = 0
        for rid, toks, q in items:
            out[rid] = (cum, b, cum < b)
            cum += toks
    return out


def _budget_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long, quality double"
    )


_BUDGET_ROWS = [
    # web: 6 docs, quality ties at 0.5 broken by id
    (1, "web", 100, 0.9), (2, "web", 200, 0.5), (3, "web", 150, 0.5),
    (4, "web", 300, 0.1), (5, "web", 50, 0.8), (6, "web", 75, None),
    # code: tiny budget
    (10, "code", 40, 0.7), (11, "code", 40, 0.6),
    # wiki: not in the budget map -> default
    (20, "wiki", 10, 0.3), (21, "wiki", 10, 0.2),
    # invalid rows
    (30, None, 10, 0.9), (31, "web", None, 0.9), (32, "web", -5, 0.9),
]
_BUDGETS = {"web": 400, "code": 50}


def test_token_budget_matches_python_oracle(spark):
    from pg_iui_ner_api_spark.operators.packing import token_budget_select

    exp = _py_budget_select(_BUDGET_ROWS, _BUDGETS, 15)
    for parts in (2, 7):
        got = {
            r["id"]: (r["cum_before"], r["budget"], r["keep"])
            for r in token_budget_select(
                _budget_df(spark, _BUDGET_ROWS), _BUDGETS,
                default_budget=15, partitions=parts,
            ).collect()
        }
        assert got == exp, parts
    # the boundary doc overshoots but is kept (bounded overflow): web
    # keeps 1(q.9,100t) + 5(q.8,50t) + 2(q.5,200t cum 150<400)
    # + 3(q.5,150t cum 350<400) -> 500 tokens against a 400 budget
    assert got[3][2] is True and got[4][2] is False
    # NULL quality sorts last but still fills remaining budget if any
    assert got[6][2] is False
    # default budget (15) applies to the unmapped wiki source; the
    # second doc starts at cum 10 < 15 so it's the bounded-overflow doc
    assert got[20][2] is True and got[21][2] is True
    # invalid rows surface with keep=false, never vanish
    assert got[30] == (None, None, False)
    assert got[31] == (None, None, False)
    assert got[32] == (None, None, False)


def test_token_budget_zero_and_empty_budgets(spark):
    from pg_iui_ner_api_spark.operators.packing import token_budget_select

    df = _budget_df(spark, [(1, "a", 5, 1.0), (2, "b", 5, 1.0)])
    got = {
        r["id"]: r["keep"]
        for r in token_budget_select(
            df, {"a": 0}, default_budget=100, partitions=2
        ).collect()
    }
    assert got == {1: False, 2: True}
    # no budgets at all + default 0: nothing kept, everything reported
    rows = token_budget_select(df, None, default_budget=0, partitions=2).collect()
    assert {r["id"]: r["keep"] for r in rows} == {1: False, 2: False}
    assert all(r["budget"] == 0 for r in rows)
