"""Deduplication operators for the large-scale training-data pipeline.

Five dedup families, each the standard web-scale shape:

  * exact           — fingerprint groupBy (one shuffle on a 16-byte key)
  * ngram_jaccard   — exploded-shingle equi-join: |A∩B| via join on the
                      shingle, sizes via per-doc counts; never a pairwise
                      cross join, so it scales to 100 TB (the join key is
                      the shingle, and hot shingles are handled by AQE
                      skew splitting)
  * minhash_lsh     — k seeded MinHash values per doc → band buckets →
                      candidate pairs via bucket groupBy (classic
                      MMDS ch.3 LSH; band collision is the only join)
  * simhash         — 64-bit sign-aggregated token-hash fingerprint;
                      near-dups = equal fingerprint (or banded prefixes)
  * embedding near-dup — cosine over the embeddings table; LSH-bucketed
                      by random-hyperplane signs so the pair join is
                      per-bucket, never a full-corpus cross join

All hashing goes through ``portable_hash64`` (md5-based) so every one of
these has a bit-identical DuckDB oracle in ``__spark_entry__``.
Everything is Column expressions + joins — zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import (
    fingerprint,
    normalize_ws,
    portable_hash64,
    spread,
    tokens,
)

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------
def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the minimum id per exact (whitespace/case-normalized) text.

    Plan: project → groupBy(md5 fingerprint) → min(id). One shuffle on
    the digest, map-side partial agg; at 100 TB this is the cheapest
    possible dedup pass (the digest is 32 bytes; the text never
    shuffles).
    """
    return (
        docs.select(F.col(id_col).alias("doc_id"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def dedup_against(new_docs: DataFrame, existing_docs: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Incremental ingestion dedup: keep a new-batch doc iff (a) its
    normalized content fingerprint is NOT already in the corpus and
    (b) it holds the minimum id for that fingerprint within the batch.

    The missing piece between one-shot ``dedup_exact`` and a living
    corpus: every real pipeline ingests batches against data it already
    accepted (the reference's 2-minute ingest scheduler has the same
    shape — each sync must not re-insert rows it stored last tick,
    /root/reference/src/utils/sync_functions.py:114).

    Scale shape: both sides reduce to (id, 32-byte fp) projections
    before anything wide — the corpus text never moves. The anti-join
    keys on the fingerprint, so at 10^12 existing docs the right side
    is the stored fingerprint table (bucketed on fp → co-located,
    Exchange-free for the new batch after one repartition); the final
    groupBy partial-aggregates map-side. One effective shuffle of
    8+32-byte rows per ingested batch.
    """
    new_fp = new_docs.select(
        F.col(id_col).alias("doc_id"), fingerprint(F.col(text_col)).alias("fp")
    )
    seen = existing_docs.select(fingerprint(F.col(text_col)).alias("fp")).distinct()
    return (
        new_fp.join(seen, "fp", "left_anti")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_batch_dups"))
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------
def _with_shingles(docs: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, sh: array<string>) with the token array materialized as a
    projection column first.

    Evaluation-cost discipline: a lambda that closes over a derived
    expression re-evaluates it PER ELEMENT (Catalyst does no
    common-subexpression elimination inside higher-order functions), so
    ``element_at(tokens(text), i)`` inside transform re-runs the regex
    split for every shingle — measured ~40 ms/doc. Materializing
    ``_toks`` as a column makes each element_at an O(1) attribute read.
    """
    from ..functions.text import normalize_ws, tokens

    t = spread(docs).select(
        F.col(id_col).alias("doc_id"), tokens(normalize_ws(F.col(text_col))).alias("_toks")
    )
    toks = F.col("_toks")
    k = F.size(toks) - (n - 1)
    sh = F.when(k <= 0, F.array(F.concat_ws(" ", toks))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
            )
        )
    )
    return t.select("doc_id", sh.alias("sh"))


def shingle_table(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) distinct — the exploded form both dedup ops share.

    explode_outer, NOT explode: for a plain explode Catalyst's
    InferFiltersFromGenerate injects ``size(<input>) > 0`` and predicate
    pushdown then substitutes the ENTIRE shingle expression into the
    parquet scan's DataFilters — re-running the tokenize+shingle work
    per row inside the (possibly single-split) scan task. Measured: the
    whole sf0.1 corpus shingled in ONE task for ~15 s via that pushed
    filter. The rule skips outer generates; the shingle array is never
    empty by construction (the CASE emits a 1-element array), so the
    isNotNull guard is a no-op semantically.
    """
    return (
        _with_shingles(docs, n, id_col, text_col)
        .select("doc_id", F.explode_outer("sh").alias("sh"))
        .where(F.col("sh").isNotNull())
        .distinct()
    )


def ngram_jaccard_pairs_report(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                               id_col: str = "doc_id", text_col: str = "text",
                               df_cap: int = 1000) -> tuple[DataFrame, DataFrame]:
    """All doc pairs (a < b) with n-gram Jaccard >= threshold, PLUS the
    dropped hub shingles — no silent caps (same contract as
    similarity.blocked_pair_edges).

    Returns ``(pairs, dropped_shingles)``: dropped_shingles lists every
    shingle whose document frequency exceeded ``df_cap`` together with
    its df, so the caller can audit what the intersection counts ignored
    (intersections over rare shingles only UNDERESTIMATE Jaccard when
    hubs are dropped) and route hub-heavy corpora through
    ``jaccard_verified_pairs`` instead.

    intersection counts come from a self-equi-join ON THE SHINGLE (not a
    doc×doc cross join): cost is Σ_sh df(sh)², bounded by the df_cap
    guard. At 100 TB prefer ``jaccard_verified_pairs`` (LSH candidates →
    exact verify), which has no df² term at all; this operator is the
    exact-at-small-scale oracle the LSH path is measured against.
    """
    # materialize the exploded shingle table once: it has FOUR consumers
    # (sizes, dfreq, both self-join sides) and each would otherwise
    # re-run the tokenize+shingle expressions over the corpus
    sh = shingle_table(docs, n, id_col, text_col).localCheckpoint()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    dropped = dfreq.where(F.col("df") > df_cap)
    rare = sh.join(dfreq.where(F.col("df") <= df_cap), "sh").select("doc_id", "sh")
    a, b = rare.alias("a"), rare.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    raw = F.col("c") / (F.col("sza") + F.col("szb") - F.col("c"))
    pairs = (
        inter.join(sizes.withColumnsRenamed({"doc_id": "da", "sz": "sza"}), "da")
        .join(sizes.withColumnsRenamed({"doc_id": "db", "sz": "szb"}), "db")
        # filter on the RAW ratio (matches the DuckDB oracle's WHERE);
        # round only for output — rounding before the threshold flipped
        # borderline rows (raw 0.1999997 -> 0.2) vs the oracle
        .where(raw >= threshold)
        .select("da", "db", F.round(raw, 6).alias("jaccard"))
    )
    return pairs, dropped


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                        id_col: str = "doc_id", text_col: str = "text",
                        df_cap: int = 1000) -> DataFrame:
    """Pairs-only convenience wrapper over ``ngram_jaccard_pairs_report``."""
    pairs, _dropped = ngram_jaccard_pairs_report(docs, n, threshold, id_col, text_col, df_cap)
    return pairs


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)


def _minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash coefficients (a_i, b_i), a_i != 0."""
    out = []
    for i in range(num_hashes):
        a = (2_654_435_761 * (i + 1)) % MINHASH_P or 1
        b = (40_503 * (i + 1) + 97) % MINHASH_P
        out.append((a, b))
    return out


def minhash_signatures(docs: DataFrame, num_hashes: int = 16, n: int = 3,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, sig: array<long>[num_hashes]).

    Each shingle is md5-hashed ONCE (portable_hash64), then the k
    minhash values derive via universal hashing
    ``h_i = (a_i * (h mod P) + b_i) mod P`` — k arithmetic ops instead
    of k digests per shingle (8x less hashing), with every intermediate
    < 2^62 so ANSI overflow checking never trips. All higher-order
    functions over the in-row shingle array — no explode, no shuffle
    until LSH banding; bit-identical DuckDB oracle in __spark_entry__.
    """
    hashed = _with_shingles(docs, n, id_col, text_col).select(
        "doc_id",
        F.transform(
            "sh", lambda s: F.pmod(portable_hash64(s), F.lit(MINHASH_P))
        ).alias("_shh"),  # md5 per shingle evaluated ONCE (column, not lambda subexpr)
    )

    def _mk(a: int, b: int):
        # single-arg closure (pyspark HOFs infer arity from the signature)
        return lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(MINHASH_P))

    mins = [
        F.array_min(F.transform("_shh", _mk(a, b)))
        for a, b in _minhash_coeffs(num_hashes)
    ]
    return hashed.select("doc_id", F.array(*mins).alias("sig"))


def minhash_lsh_pairs(docs: DataFrame, num_hashes: int = 16, bands: int = 4,
                      n: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Candidate near-dup pairs via banded LSH over MinHash signatures.

    rows-per-band = num_hashes/bands; docs sharing any full band land in
    the same bucket. The only shuffle is groupBy(band, band_signature);
    inside a bucket pairs are enumerated with a self-join on the bucket
    key (buckets are tiny by construction; a pathological mega-bucket —
    an exact-dup cluster — is exactly the output we want anyway).
    """
    rows = num_hashes // bands
    # self-join below would otherwise recompute the full signature
    # expression on BOTH sides — checkpoint the (tiny, id+sig) relation
    # once so each side is a block-manager scan
    sigs = minhash_signatures(docs, num_hashes, n, id_col, text_col).localCheckpoint()
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.concat_ws(",", F.slice("sig", b * rows + 1, rows)).alias("bsig"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bsig")
    x, y = banded.alias("x"), banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bsig") == F.col("y.bsig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("da"), F.col("y.doc_id").alias("db"))
        .distinct()
    )


def jaccard_verified_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                           num_hashes: int = 16, bands: int = 4,
                           id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact n-gram Jaccard >= threshold, computed ONLY on MinHash-LSH
    candidate pairs — the documented 100 TB scale path.

    ``ngram_jaccard_pairs`` pays Σ_sh df(sh)² on the shingle self-join
    and must drop hub shingles to stay bounded (underestimating Jaccard
    when it does). This variant generates candidates with banded LSH
    (cost linear in corpus + bucket collisions), then verifies the exact
    Jaccard per candidate by joining the candidate list back to the
    shingle table on each side: cost is |candidates| x shingles/doc — no
    df² term, no hub-shingle cap, exact values on every emitted pair.

    Approximation is one-sided and explicit: a true near-dup pair missed
    by every LSH band is missed here too (recall tuned by
    num_hashes/bands); every pair that IS emitted carries its exact
    full-shingle-set Jaccard.
    """
    cands = minhash_lsh_pairs(docs, num_hashes, bands, n, id_col, text_col)
    # three consumers of the shingle table (sizes + both verify joins)
    sh = shingle_table(docs, n, id_col, text_col).localCheckpoint()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cands.join(sh.withColumnsRenamed({"doc_id": "da"}), "da")
        .join(sh.withColumnsRenamed({"doc_id": "db"}), ["db", "sh"])
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    raw = F.col("c") / (F.col("sza") + F.col("szb") - F.col("c"))
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "da", "sz": "sza"}), "da")
        .join(sizes.withColumnsRenamed({"doc_id": "db", "sz": "szb"}), "db")
        .where(raw >= threshold)
        .select("da", "db", F.round(raw, 6).alias("jaccard"))
    )


def fuzzy_dedup(docs: DataFrame, num_hashes: int = 16, bands: int = 4,
                n: int = 3, threshold: float | None = None,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """End-to-end fuzzy deduplication — the composite web-corpus curation
    op (the FineWeb/Dolma shape): near-dup PAIRS alone don't dedup a
    corpus; transitive clusters do.

    Stages: banded-LSH candidate pairs (``minhash_lsh_pairs``; with
    ``threshold`` set, exact-Jaccard verification via
    ``jaccard_verified_pairs`` prunes band collisions first) → connected
    components over the pair graph (duplicate clusters are transitive:
    A≈B and B≈C must collapse to one kept doc even when A,C never share
    a band) → representative = min ``doc_id`` per cluster.

    Returns one row per input doc: ``(doc_id, cluster_id, keep)`` with
    ``cluster_id`` = min doc_id of the doc's near-dup cluster (itself
    when it has no near-dups) and ``keep`` = (doc_id == cluster_id), so
    ``where(keep)`` is the deduplicated corpus and ``n - count(keep)``
    the removal rate.

    100 TB shape: the pair graph is O(duplicate docs), orders of
    magnitude smaller than the corpus — ``connected_components``'s
    adaptive driver/star-loop handles either regime — and the cluster
    map joins back to the corpus on the 8-byte id (one shuffle of ids,
    document text never moves). Requires a numeric ``id_col`` (the
    component algebra is over longs); at ingest, derive one via
    ``xxhash64(uri)`` if ids are strings.

    Provenance: the reference dedups only exact registry names
    (/root/reference/src/routers/main_endpoints.py:74-81); content-level
    fuzzy dedup is engine-side new work.
    """
    if threshold is not None:
        pairs = jaccard_verified_pairs(
            docs, n=n, threshold=threshold, num_hashes=num_hashes,
            bands=bands, id_col=id_col, text_col=text_col,
        )
    else:
        pairs = minhash_lsh_pairs(
            docs, num_hashes=num_hashes, bands=bands, n=n,
            id_col=id_col, text_col=text_col,
        )
    return _cluster_keep(docs, pairs, "da", "db", id_col)


def _cluster_keep(rows: DataFrame, pairs: DataFrame, a_col: str, b_col: str,
                  id_col: str) -> DataFrame:
    """Near-dup pair list -> per-row (id, cluster_id, keep): connected
    components over the pair graph, min-id representative, rows outside
    the graph keep themselves. Shared tail of fuzzy_dedup/semantic_dedup:
    the component map joins back on the 8-byte id, payloads never move."""
    from .components import connected_components

    comp = connected_components(
        pairs.select(
            F.col(a_col).cast("long").alias("u"),
            F.col(b_col).cast("long").alias("v"),
        )
    )
    out = rows.select(F.col(id_col).alias(id_col)).join(
        comp.withColumnsRenamed({"node": id_col, "component": "_c"}),
        id_col,
        "left",
    )
    cluster = F.coalesce(F.col("_c"), F.col(id_col))
    return out.select(
        id_col,
        cluster.alias("cluster_id"),
        (cluster == F.col(id_col)).alias("keep"),
    )


def semantic_dedup(embs: DataFrame, threshold: float = 0.95,
                   planes: int = 8, dim: int = 64,
                   id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    """SemDeDup-shape semantic deduplication: embedding-cosine near-dup
    pairs (sign-LSH blocked for scale; ``planes=0`` = exact oracle
    variant) → connected components → min-id representative per
    semantic cluster. Returns ``(vec_id, cluster_id, keep)``.

    The lexical twin is ``fuzzy_dedup`` (shingle MinHash); this one
    collapses paraphrases and re-encodings that share no n-grams. Same
    100 TB shape: the pair graph is O(near-dup rows), the join back to
    the corpus carries only ids, and embeddings never shuffle past the
    blocked pair join.
    """
    pairs = embedding_near_dups(embs, threshold, id_col, emb_col, planes, dim)
    return _cluster_keep(embs, pairs, "va", "vb", id_col)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash(docs: DataFrame, bits: int = 32, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(doc_id, simhash: long) — sign-aggregated token-hash fingerprint.

    For each bit b: +1 if portable_hash64(token) has bit b set else -1,
    summed over tokens; simhash bit b = 1 iff the sum > 0. All in-row
    higher-order functions (token array never explodes); the result is a
    32-bit int comparable by Hamming distance.
    """
    toks = F.filter(F.split(normalize_ws(F.col(text_col)), " "), lambda t: t != "")
    # token hashes as a materialized column: one md5 per token, not one
    # per (token, bit) — lambdas re-evaluate closed-over subexpressions
    hashed = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.transform(toks, lambda t: portable_hash64(t)).alias("_th"),
    )
    # (h >> b) & 1 with a *column* shift amount: pyspark's shiftright only
    # takes literal counts, so test the bit with a mask instead:
    # (h & 2^b) != 0. 2^b is exact in double for b < 63, then cast long.
    pow2 = lambda b: F.pow(F.lit(2.0), b).cast("long")  # noqa: E731
    bit_sums = F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda b: F.aggregate(
            "_th",
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(pow2(b)) != 0, 1).otherwise(-1),
        ),
    )
    sim = F.aggregate(
        F.zip_with(
            bit_sums,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda s, b: F.when(s > 0, pow2(b)).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return hashed.select("doc_id", sim.alias("simhash"))


def simhash_dup_groups(docs: DataFrame, bits: int = 32) -> DataFrame:
    """Exact-simhash collision groups (Hamming-0); Hamming-k lives in
    ``simhash_near_pairs``."""
    return (
        simhash(docs, bits)
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n"), F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .where(F.col("n") > 1)
    )


def simhash_near_pairs(docs: DataFrame, bits: int = 32, k: int = 2,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """All pairs (a < b) with Hamming(simhash_a, simhash_b) <= k.

    Banded exactly like minhash_lsh_pairs: split the fingerprint into
    k+1 bit segments — by pigeonhole, any pair within Hamming-k agrees
    EXACTLY on at least one segment — join candidates per (band,
    segment value), then verify the true distance with
    bit_count(a XOR b). The only shuffle is the segment equi-join; never
    an all-pairs comparison, and recall is 1.0 by construction (unlike
    probabilistic LSH).
    """
    bands = k + 1
    seg = bits // bands
    sh = simhash(docs, bits, id_col, text_col).localCheckpoint()
    segments = []
    for b in range(bands):
        lo = b * seg
        width = (bits - lo) if b == bands - 1 else seg
        segments.append(
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("simhash", lo).bitwiseAND(
                    F.lit((1 << width) - 1)
                ).alias("segval"),
            )
        )
    banded = sh.select(
        "doc_id", "simhash", F.explode(F.array(*segments)).alias("bb")
    ).select("doc_id", "simhash", "bb.band", "bb.segval")
    x, y = banded.alias("x"), banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.segval") == F.col("y.segval"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("da"),
            F.col("y.doc_id").alias("db"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= k)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------
def cosine(a, b):  # Column, Column -> Column
    """Cosine similarity of two array<float|double> columns.

    Elements are cast to double BEFORE any multiply and folded
    left-to-right (F.aggregate is an ordered fold), so the result is
    bit-identical to the DuckDB oracle's ordered
    list_sum(list_transform(...)) over double-cast elements."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda s, v: s + v,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda s, v: s + v,
        )
    )
    return dot / F.greatest(na * nb, F.lit(1e-12))


def embedding_near_dups(embs: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", emb_col: str = "embedding",
                        planes: int = 8, dim: int = 64) -> DataFrame:
    """Pairs with cosine >= threshold, blocked by a random-hyperplane
    sign bucket so the pair join is per-bucket (sign-LSH: true near-dups
    almost always share the bucket at high thresholds).

    The "random" hyperplanes are md5-seeded deterministic ±1 vectors —
    reproducible across runs and engines. Pass ``planes=0`` for the
    exact (unblocked) variant used as the small-scale oracle.
    """
    e = spread(embs).select(F.col(id_col).alias("vec_id"), F.col(emb_col).alias("emb"))
    if planes:
        # hyperplanes are row-independent constants: precompute the ±1
        # sign vectors in Python (md5-seeded, deterministic) and embed
        # them as foldable literal arrays — the per-row work is `planes`
        # constant-vector dot products, not planes*dim digests
        import hashlib

        def plane_vec(p: int) -> list[float]:
            return [
                1.0 if (int(hashlib.md5(f"{p}#{i + 1}".encode()).hexdigest()[:15], 16) >> 3) & 1
                else -1.0
                for i in range(dim)
            ]

        def sign_bit(p: int):
            lit = F.array(*[F.lit(v) for v in plane_vec(p)])
            dot = F.aggregate(
                F.zip_with("emb", lit, lambda x, h: x.cast("double") * h),
                F.lit(0.0),
                lambda s, v: s + v,
            )
            return F.when(dot > 0, "1").otherwise("0")

        # materialize (vec_id, emb, bucket) ONCE: the self-join would
        # otherwise evaluate the `planes` fold expressions on BOTH sides
        # (same trick as minhash_lsh_pairs' signature checkpoint; at
        # warehouse scale this is the bucketed table write)
        e = e.withColumn(
            "bucket", F.concat(*[sign_bit(p) for p in range(planes)])
        ).localCheckpoint()
        join_cond = (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.vec_id") < F.col("y.vec_id"))
    else:
        join_cond = F.col("x.vec_id") < F.col("y.vec_id")
    x, y = e.alias("x"), e.alias("y")
    raw = cosine(F.col("x.emb"), F.col("y.emb"))
    # threshold the RAW cosine (matches the oracle's WHERE on the
    # unrounded expression); round only for output
    return (
        x.join(y, join_cond)
        .select(
            F.col("x.vec_id").alias("va"),
            F.col("y.vec_id").alias("vb"),
            raw.alias("_raw"),
        )
        .where(F.col("_raw") >= threshold)
        .select("va", "vb", F.round(F.col("_raw"), 6).alias("cos"))
    )


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------
def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Flag corpus documents sharing ≥ ``min_overlap`` distinct word
    n-grams with any benchmark text — the test-set decontamination pass
    a pretraining pipeline runs so eval prompts never leak into
    training data (the GPT-3/PaLM-style 13-gram check, here with the
    same shingle constructor the dedup family uses).

    Returns ``(doc_id, n_overlap, n_shingles, contamination)`` for
    flagged docs only; ``contamination`` is the overlapping fraction of
    the doc's distinct shingles.

    Scale shape: the benchmark side is tiny (eval sets, not corpora),
    so its distinct-shingle set is BROADCAST and the corpus-side plan
    is one scan → in-row shingling → broadcast semi-ish join → one
    groupBy that carries only (doc_id, n_shingles, count) — document
    text never shuffles and there is no corpus self-join. The per-doc
    shingle count rides along from the pre-explode projection, so the
    corpus is shingled exactly once.
    """
    # zero-token texts shingle to [""] (the whole-doc fallback); drop the
    # empty shingle on BOTH sides or one blank benchmark row would flag
    # every blank corpus doc as 100% contaminated
    wsh = _with_shingles(docs, n, id_col, text_col)
    sized = wsh.select(
        "doc_id",
        F.size("sh").cast("long").alias("n_shingles"),
        F.explode_outer("sh").alias("sh"),
    ).where(F.col("sh").isNotNull() & (F.col("sh") != ""))
    bench = shingle_table(
        benchmark.select(
            F.lit("_bench").alias("doc_id"), F.col(bench_text_col).alias("text")
        ),
        n,
    ).select("sh").where(F.col("sh") != "")
    hits = (
        sized.join(F.broadcast(bench), "sh")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return hits.where(F.col("n_overlap") >= min_overlap).select(
        "doc_id",
        "n_overlap",
        "n_shingles",
        F.round(F.col("n_overlap") / F.col("n_shingles"), 6).alias("contamination"),
    )


# ---------------------------------------------------------------------------
# corpus-wide line dedup
# ---------------------------------------------------------------------------
def dedup_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide duplicate-LINE removal keeping the first occurrence
    (ordered by ``(doc_id, position)``) — the C4/RefinedWeb-style exact
    line-dedup pass that strips boilerplate (nav bars, cookie banners)
    repeated across pages. ``sep`` is the line-split regex.

    Returns one row per input doc: ``(doc_id, text_clean, n_kept,
    n_dropped)`` where ``text_clean`` rejoins surviving lines with
    ``\\n`` in original order (blank lines are structural and never
    deduped; docs whose every line is dropped survive with empty text).

    Scale shape: two shuffles. (1) the winner pick per distinct line is
    ``min(struct(doc_id, pos))`` under a groupBy on the line — a
    partial-aggregable min, so a boilerplate line occurring 10^9 times
    collapses map-side and crosses the wire once per map task, not once
    per occurrence (this is why it's an agg and NOT a row_number window,
    which would shuffle every occurrence to one reducer — the skew
    killer); (2) doc reassembly keyed by doc_id. Line text crosses each
    exchange at most once.
    """
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    blank = F.length(F.trim(F.col("line"))) == 0
    nb = lines.where(~blank)
    winners = (
        nb.groupBy("line")
        .agg(F.min(F.struct("doc_id", "pos")).alias("w"))
        .select(F.col("w.doc_id").alias("doc_id"), F.col("w.pos").alias("pos"), "line")
    )
    kept = winners.unionByName(lines.where(blank))
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
        ).alias("text_clean"),
        F.sum((F.length(F.trim(F.col("line"))) > 0).cast("long")).alias("n_kept"),
    )
    totals = nb.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(rebuilt, "doc_id", "left")
        .join(totals, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.coalesce("n_lines", F.lit(0)) - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
    )


# ---------------------------------------------------------------------------
# corpus-wide repeated-span detection (ExactSubstr-style)
# ---------------------------------------------------------------------------
def repeated_spans(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal token spans whose every ``k``-gram repeats somewhere in
    the corpus — the span-level exact-substring dedup of Lee et al.
    2022 ("Deduplicating Training Data Makes Language Models Better",
    ExactSubstr), re-expressed as a hashed k-gram inverted index
    instead of their single-machine suffix array.

    A token position ``p`` (0-based) is *duplicated* when the k-gram
    starting there occurs ≥ 2 times corpus-wide (including twice in
    the same document — self-repetition counts, as in the paper).
    Runs of duplicated k-gram starts whose token intervals
    ``[p, p+k-1]`` overlap or touch merge into one maximal span.
    Output: ``(doc_id, tok_start, tok_end, n_grams)`` — positions are
    whitespace-token indices over the normalized text; callers scrub
    by slicing the same tokenization. Docs shorter than ``k`` tokens
    emit nothing.

    Scale shape (the suffix array is the part that can't scale —
    hashing can): k-grams are md5-hashed IN-ROW before any explode, so
    no shuffle ever carries text. (1) gram counts: partial-aggregable
    groupBy on the 8-byte hash — a boilerplate gram occurring 10^9
    times collapses map-side (same skew argument as dedup_lines);
    (2) one sort-merge join of (doc_id, p, h) against the hot-hash
    set on h; (3) span merge per doc via a doc_id window — partition
    size is bounded by document length, never by gram popularity.
    False positives are md5 collisions (~2^-60 per pair): accepted and
    identical in the DuckDB oracle, which replays the same hash.
    """
    # Tokenize ONCE per row behind a projection boundary. Splicing the
    # tokens(...) tree inline into the gram lambda duplicates it k+1
    # times — each element_at() then re-runs the regexp split PER GRAM
    # POSITION (O(len·k) re-tokenizations per doc; measured 258 s at
    # sf0.01 vs ~3 s with the bound column). CollapseProject keeps the
    # boundary because the alias is non-cheap and multiply referenced.
    toks = F.col("toks")
    n_grams_in_doc = F.size(toks) - (k - 1)
    # slice+array_join is ONE expression node each vs k element_at nodes
    # — HOF lambdas are interpreted (not codegen'd), so node count is
    # the constant factor that matters here
    gram = lambda i: F.array_join(F.slice(toks, i, k), " ")  # noqa: E731
    # guard: sequence(1, m) DESCENDS when m < 1 — emit [] for short docs
    gh = F.when(
        n_grams_in_doc >= 1,
        F.transform(F.sequence(F.lit(1), n_grams_in_doc),
                    lambda i: portable_hash64(gram(i))),
    ).otherwise(F.array().cast("array<long>"))
    grams = (
        spread(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            tokens(normalize_ws(F.col(text_col))).alias("toks"),
        )
        .select("doc_id", F.posexplode(gh).alias("p", "h"))
    )
    hot = (
        grams.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("h")
    )
    dup = grams.join(hot, "h").select("doc_id", "p")
    # gaps-and-islands: starts p, p' belong to one span iff p' - p <= k
    # (interval overlap p'-p <= k-1, plus adjacency p'-p == k: the
    # duplicated text is contiguous either way)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("p")
    brk = F.when(
        F.col("p") - F.lag("p").over(w) <= k, F.lit(0)
    ).otherwise(F.lit(1))
    islands = dup.withColumn("brk", brk).withColumn(
        "isl", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy("doc_id", "isl")
        .agg(
            F.min("p").alias("tok_start"),
            (F.max("p") + F.lit(k - 1)).alias("tok_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select("doc_id", "tok_start", "tok_end", "n_grams")
    )


# ---------------------------------------------------------------------------
# cross-document boilerplate removal
# ---------------------------------------------------------------------------
def boilerplate_strip(
    docs: DataFrame,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
    sep: str = "\n",
) -> DataFrame:
    """Strip *boilerplate* lines — non-blank lines that occur in at
    least ``min_docs`` DISTINCT documents — from EVERY document (the
    C4/RefinedWeb template-removal pass: nav bars, cookie banners,
    license footers repeated across a site's pages). Unlike
    :func:`dedup_lines` (which keeps the first occurrence), a flagged
    line is removed everywhere: a line repeated across many pages is
    template markup, not content, and the first page doesn't get to
    keep it. ``group_col`` scopes the document-frequency count (e.g.
    per ``source``/domain — a header is boilerplate *within its site*);
    ``None`` counts corpus-wide.

    Returns one row per input doc: ``(doc_id, text_clean, n_kept,
    n_dropped)`` — same contract as :func:`dedup_lines` (blank lines
    are structural, never counted or stripped).

    Scale shape: the document-frequency count runs entirely on 8-byte
    ``xxhash64`` line keys — a partial-aggregable distinct + count, so
    a line occurring 10^9 times collapses map-side; line TEXT never
    enters that path. The flagged set (distinct boilerplate lines) is
    tiny by construction, so AQE broadcasts the left_anti probe; the
    only text-bearing shuffle is the final doc_id-keyed reassembly.
    An xxhash64 collision could merge two distinct lines' counts
    (P ~ n^2/2^64 — negligible; flags only, text equality never
    assumed).
    """
    grp = [F.col(group_col)] if group_col else []
    grp_names = [group_col] if group_col else []
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        *grp,
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    blank = F.length(F.trim(F.col("line"))) == 0
    nb = lines.where(~blank).withColumn("h", F.xxhash64("line"))
    flagged = (
        nb.select(*grp_names, "h", "doc_id")
        .distinct()
        .groupBy(*grp_names, "h")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .where(F.col("ndocs") >= min_docs)
        .select(*grp_names, "h")
    )
    kept_nb = nb.join(flagged, [*grp_names, "h"], "left_anti")
    kept = kept_nb.select("doc_id", "pos", "line").unionByName(
        lines.where(blank).select("doc_id", "pos", "line")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
        ).alias("text_clean"),
        F.sum((F.length(F.trim(F.col("line"))) > 0).cast("long")).alias("n_kept"),
    )
    totals = nb.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(rebuilt, "doc_id", "left")
        .join(totals, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.coalesce("n_lines", F.lit(0)) - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
    )


# ---------------------------------------------------------------------------
# leakage-safe splits
# ---------------------------------------------------------------------------
def leakage_safe_split(
    docs: DataFrame,
    train: float = 0.90,
    dev: float = 0.05,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train/dev/test assignment that can never leak a near-duplicate
    across splits: hash the *near-dup cluster id*, not the doc id, so
    every member of a fuzzy-dedup cluster lands in the same split.
    Per-doc hash splits (``split_assign``) contaminate eval sets the
    moment two near-identical pages hash differently — the GPT-3-era
    train/test-overlap failure; clustering first closes it by
    construction.

    Returns ``(doc_id, cluster_id, split)`` for every input doc:
    ``cluster_id`` = min doc_id of the doc's near-dup cluster (itself
    when unclustered, via :func:`fuzzy_dedup`'s LSH → connected
    components), ``split`` = the same deterministic md5-bucket rule as
    ``dataset_split`` applied to ``cluster_id``. Identity-hashed:
    stable across reruns, repartitioning, and corpus appends — and the
    marginal split fractions stay ≈(train, dev, rest) because cluster
    ids hash uniformly.

    Scale shape: everything heavy is :func:`fuzzy_dedup` (banded LSH,
    pair graph orders of magnitude smaller than the corpus); the split
    itself is in-row column algebra on an 8-byte id.
    """
    from ..functions.text import dataset_split

    cl = fuzzy_dedup(
        docs, num_hashes=num_hashes, bands=bands, n=n,
        threshold=threshold, id_col=id_col, text_col=text_col,
    )
    return cl.select(
        "doc_id",
        "cluster_id",
        dataset_split(F.col("cluster_id"), train, dev).alias("split"),
    )


def cdc_chunks(
    docs: DataFrame,
    window: int = 4,
    modulus: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking: ``(doc_id, chunk_idx, n_tokens,
    chunk_hash)`` with chunk boundaries cut where the rolling
    ``window``-token hash is ``0 (mod modulus)`` — the Rabin-style CDC
    of LBFS (Muthitacharoen et al., SOSP 2001) over tokens instead of
    bytes. Expected chunk length ~``modulus`` tokens.

    Why a THIRD dedup granularity: ``dedup_lines`` keys on literal line
    boundaries and ``repeated_spans`` on fixed k-gram windows; CDC
    boundaries move WITH the content, so an insertion near the top of a
    re-crawled page shifts only the chunks it touches — every
    downstream chunk re-aligns and still hash-matches its twin (the
    shift-robustness fixed-size chunking structurally lacks).

    Scale shape: tokenization, rolling hashes, boundary selection and
    chunk hashing are ALL in-row Column algebra behind one projection
    boundary (the bound ``toks`` column — same CollapseProject contract
    as ``repeated_spans``); the output explode carries (16-byte hash,
    two ints) per chunk and the operator itself shuffles nothing. Docs
    shorter than ``window`` tokens form a single whole-doc chunk; empty
    docs emit nothing.
    """
    if window < 1 or modulus < 1:
        raise ValueError("window and modulus must be >= 1")
    toks = F.col("toks")
    n = F.size(toks)
    gram = lambda i: F.array_join(  # noqa: E731
        F.slice(toks, i - (window - 1), window), " "
    )
    # cut AFTER token i when the window ending at i hashes to 0 mod m;
    # i == n is excluded (the end is always a boundary). sequence()
    # DESCENDS for n < window — guard to [].
    cuts = F.when(
        n >= window,
        F.filter(
            F.sequence(F.lit(window), n),
            lambda i: (portable_hash64(gram(i)) % modulus == 0) & (i < n),
        ),
    ).otherwise(F.array().cast("array<int>"))
    bounds_expr = F.concat(F.array(F.lit(0)), cuts, F.array(n))
    # bound column, NOT inline: `pairs` references bounds 3x per chunk,
    # and an inline expression would re-hash every window per reference
    # (the repeated_spans O(len*k) trap — measured 11 s -> 1.8 s at
    # sf0.1). CollapseProject keeps the boundary: non-cheap alias,
    # multiply referenced.
    bounds = F.col("bounds")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(bounds) - 1),
        lambda j: F.struct(
            (j - 1).alias("chunk_idx"),
            (F.element_at(bounds, j + 1) - F.element_at(bounds, j)).alias(
                "n_tokens"
            ),
            portable_hash64(
                F.array_join(
                    F.slice(
                        toks,
                        F.element_at(bounds, j) + 1,
                        F.element_at(bounds, j + 1) - F.element_at(bounds, j),
                    ),
                    " ",
                )
            ).alias("chunk_hash"),
        ),
    )
    return (
        spread(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            tokens(normalize_ws(F.col(text_col))).alias("toks"),
        )
        .select("doc_id", "toks", bounds_expr.alias("bounds"))
        .select("doc_id", F.explode(pairs).alias("c"))
        .select("doc_id", "c.chunk_idx", "c.n_tokens", "c.chunk_hash")
        .where(F.col("n_tokens") > 0)
    )


def cdc_dup_chunks(
    docs: DataFrame,
    window: int = 4,
    modulus: int = 8,
    min_occurrences: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide duplicated-chunk report over :func:`cdc_chunks`:
    ``(chunk_hash, n_tokens, n_docs, n_occurrences)`` for chunks seen
    >= ``min_occurrences`` times. ONE partial-aggregable shuffle keyed
    by the 8-byte chunk hash — chunk text never moves; callers scrub or
    weight by re-deriving chunks per doc (same in-row algebra)."""
    chunks = cdc_chunks(docs, window, modulus, id_col, text_col)
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.min("n_tokens").alias("n_tokens"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_occurrences") >= min_occurrences)
    )
