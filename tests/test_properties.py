"""Property-based tests (hypothesis) for the invariant-heavy operators.

Two targets where example-based tests leave gaps:

  * gap-based sessionization vs an independent pure-Python reference,
    over arbitrary event multisets (duplicates, unsorted input, ties,
    multi-user interleaving);
  * BIO "simple" aggregation decode (the reference's HF
    ``aggregation_strategy='simple'`` semantics,
    /root/reference/src/routers/main_endpoints.py:166-176) over
    arbitrary tag sequences: span bounds, ordering, non-overlap, and
    merge behavior must hold for EVERY input, not just the fixtures.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pg_iui_ner_api_spark.operators.bio_decode import ID2LABEL, decode_bio_simple
from pg_iui_ner_api_spark.operators.sessionize import session_stats

GAP = 100  # seconds

EPOCH = dt.datetime(2024, 1, 1)


def _ref_sessions(events):
    """Independent reference: per-user sort, split on gap > GAP."""
    out = {}
    by_user = {}
    for uid, off in events:
        by_user.setdefault(uid, []).append(off)
    for uid, offs in by_user.items():
        offs.sort()
        sid = 0
        out[(uid, sid)] = [offs[0], offs[0], 1]
        prev = offs[0]
        for o in offs[1:]:
            if o - prev > GAP:
                sid += 1
                out[(uid, sid)] = [o, o, 1]
            else:
                out[(uid, sid)][1] = o
                out[(uid, sid)][2] += 1
            prev = o
    return {
        k: (n, (EPOCH + dt.timedelta(seconds=a)).strftime("%Y-%m-%d %H:%M:%S"),
            (EPOCH + dt.timedelta(seconds=b)).strftime("%Y-%m-%d %H:%M:%S"))
        for k, (a, b, n) in out.items()
    }


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 2000)),
        min_size=1, max_size=40,
    )
)
def test_sessionize_matches_reference(spark, events):
    rows = [
        (i, uid, EPOCH + dt.timedelta(seconds=off))
        for i, (uid, off) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["t_start"], r["t_end"])
        for r in session_stats(df, gap_seconds=GAP).collect()
    }
    assert got == _ref_sessions(events)


# --- BIO decode properties --------------------------------------------------

LABELS = list(ID2LABEL.values())


@st.composite
def tagged_text(draw):
    """Random word sequence with per-word tag ids and clean offsets."""
    n = draw(st.integers(1, 12))
    words, offsets = [], []
    pos = 0
    for i in range(n):
        w = draw(st.text(alphabet="abcdef", min_size=1, max_size=5))
        if i:
            pos += 1  # single space
        offsets.append((pos, pos + len(w)))
        words.append(w)
        pos += len(w)
    text = " ".join(words)
    tag_ids = draw(st.lists(st.integers(0, len(LABELS) - 1),
                            min_size=n, max_size=n))
    return text, offsets, tag_ids


@settings(max_examples=200, deadline=None)
@given(tagged_text())
def test_decode_bio_simple_invariants(case):
    text, offsets, tag_ids = case
    n = len(offsets)
    probs = np.full((n, len(LABELS)), 0.01)
    probs[np.arange(n), tag_ids] = 0.9
    spans = decode_bio_simple(text, offsets, probs)

    prev_end = -1
    for s in spans:
        # bounds + substring integrity
        assert 0 <= s.start < s.end <= len(text)
        assert s.word == text[s.start:s.end]
        # ordered, non-overlapping
        assert s.start >= prev_end
        prev_end = s.end
        # entity kind comes from the tag space
        assert any(lbl.endswith(s.entity_group) for lbl in LABELS if lbl != "O")
        assert 0.0 < s.score <= 1.0

    # every non-O tagged token is covered by exactly one span
    covered = [
        any(sp.start <= a and b <= sp.end for sp in spans)
        for (a, b), t in zip(offsets, tag_ids)
    ]
    for (a, b), t, cov in zip(offsets, tag_ids, covered):
        if LABELS[t] != "O":
            assert cov, (text, offsets, tag_ids)

    # adjacent same-type I-continuations never split: a B-X followed by
    # I-X on the next token must sit inside one span
    for i in range(n - 1):
        ti, tj = LABELS[tag_ids[i]], LABELS[tag_ids[i + 1]]
        if ti != "O" and tj == "I-" + ti[2:]:
            sp_i = next(sp for sp in spans
                        if sp.start <= offsets[i][0] and offsets[i][1] <= sp.end)
            assert sp_i.start <= offsets[i + 1][0] and offsets[i + 1][1] <= sp_i.end


# ---------------------------------------------------------------------------
# As-of join vs an independent brute-force reference over arbitrary
# event multisets (ties, duplicates, empty sides, multi-key interleave).
# ---------------------------------------------------------------------------
@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),     # key
            st.integers(min_value=0, max_value=50),    # second offset
            st.booleans(),                             # is_left
        ),
        min_size=1,
        max_size=40,
    )
)
def test_asof_join_matches_brute_force(spark, events):
    from pg_iui_ner_api_spark.operators.analytics import asof_join

    rows = [
        (i, k, EPOCH + dt.timedelta(seconds=off), "L" if is_l else "R")
        for i, (k, off, is_l) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, side string"
    )
    left = df.where("side = 'L'").select("event_id", "user_id", "ts")
    right = df.where("side = 'R'").select("event_id", "user_id", "ts")
    got = {
        r["event_id"]: (r["matched_ts"], r["event_id_r"])
        for r in asof_join(
            left, right, ["user_id"], right_cols=["event_id"],
            tiebreak="event_id",
        ).collect()
    }

    base = int(EPOCH.timestamp())
    want = {}
    for i, (k, off, is_l) in enumerate(events):
        if not is_l:
            continue
        # brute force: latest right at-or-before; ties -> max event_id
        best = None
        for j, (k2, off2, is_l2) in enumerate(events):
            if is_l2 or k2 != k or off2 > off:
                continue
            cand = (off2, j)
            if best is None or cand > best:
                best = cand
        want[i] = (base + best[0], best[1]) if best else (None, None)
    assert got == want


# ---------------------------------------------------------------------------
# r4 curation operators vs pure-Python references over arbitrary corpora.
# ---------------------------------------------------------------------------
_WORDS = st.lists(
    st.sampled_from(["the", "cat", "dog", "ran", "sat", "a", "on", "xyzzy"]),
    min_size=0, max_size=30,
)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(_WORDS, min_size=1, max_size=12),
    st.integers(min_value=2, max_value=9),   # size
    st.integers(min_value=0, max_value=8),   # overlap (clamped < size)
)
def test_chunk_documents_matches_reference(spark, docs, size, overlap):
    from pg_iui_ner_api_spark.operators.packing import chunk_documents

    overlap = min(overlap, size - 1)
    step = size - overlap
    rows = [(f"d{i}", " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {}
    for r in chunk_documents(df, size=size, overlap=overlap).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["tok_start"], r["tok_end"], r["chunk_text"])
        )
    import math as _m

    for i, ws in enumerate(docs):
        n = len(ws)
        want = []
        if n:
            n_chunks = 1 if n <= size else 1 + _m.ceil((n - size) / step)
            for c in range(n_chunks):
                s, e = c * step, min(c * step + size, n)
                want.append((c, s, e, " ".join(ws[s:e])))
        assert sorted(got.get(f"d{i}", [])) == want


@settings(max_examples=8, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=5),
)
def test_shuffle_corpus_is_always_a_permutation(spark, ids, n_shards):
    from pg_iui_ner_api_spark.operators.packing import shuffle_corpus

    df = spark.createDataFrame([(f"d{i}",) for i in ids], "doc_id string")
    rows = shuffle_corpus(df, seed="p", n_shards=n_shards).collect()
    assert len(rows) == len(ids)
    assert {r["doc_id"] for r in rows} == {f"d{i}" for i in ids}
    by_shard = {}
    for r in rows:
        assert 0 <= r["shard"] < n_shards
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


@settings(max_examples=6, deadline=None)
@given(st.lists(_WORDS, min_size=1, max_size=10))
def test_lm_score_matches_reference(spark, docs):
    import hashlib
    import math as _m
    from collections import Counter

    from pg_iui_ner_api_spark.operators.lm import lm_score

    rows = [(f"d{i}", " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
           for r in lm_score(df).collect()}

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    bi = {f"d{i}": [(ws[j], ws[j + 1]) for j in range(len(ws) - 1)]
          for i, ws in enumerate(docs) if len(ws) >= 2}
    c2 = Counter(h(f"{a} {b}") for ps in bi.values() for a, b in ps)
    c1 = Counter(h(a) for ps in bi.values() for a, _ in ps)
    v = len(c1)
    want = {}
    for d, ps in bi.items():
        lps = [_m.log((c2[h(f'{a} {b}')] + 1.0) / (c1[h(a)] + v)) for a, b in ps]
        want[d] = (len(ps), round(sum(lps) / len(lps), 4))
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == pytest.approx(want[d][1], abs=2e-4)


# ---------------------------------------------------------------------------
# dictionary encoding: for EVERY value set, ids are a dense permutation
# equal to the (bucket, value) sort order — the invariant the B-bucket
# prefix-sum construction must preserve regardless of bucket skew
# ---------------------------------------------------------------------------
@settings(max_examples=12, deadline=None)
@given(
    st.sets(st.text(alphabet="abcXYZ09/_:", min_size=0, max_size=12), max_size=40),
    st.sampled_from([1, 2, 7, 64]),
)
def test_dictionary_encode_dense_sorted_property(spark, values, buckets):
    import hashlib

    from pg_iui_ner_api_spark.operators.encoding import dictionary_encode

    df = spark.createDataFrame(
        [(v,) for v in values] or [(None,)], schema="s string"
    )
    got = {
        r["value"]: r["id"]
        for r in dictionary_encode(df, "s", buckets=buckets).collect()
    }

    def h64(x):
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

    order = sorted(values, key=lambda v: (h64(v) % buckets, v))
    assert got == {v: i for i, v in enumerate(order)}
