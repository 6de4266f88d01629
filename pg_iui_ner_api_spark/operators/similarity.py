"""Blocked mention-similarity edges with hub-key salting (SURVEY.md J4).

The canonicalization graph needs edges between co-referent mentions.
A naive blocked self-join pairs every two mentions sharing a blocking
key — O(n²) inside a block, fatal for hub entities ('Acme' with 10^9
mentions). Two complementary mitigations, both here:

  * ``salted_block_edges`` — connectivity-preserving edge construction:
    hub blocks (rows > hub_threshold) are SALTED into ``salt``
    sub-blocks via pmod(xxhash64(id), salt); each sub-block pairs
    internally against its minimum id (star, O(n) edges) and sub-block
    representatives are bridged so the block stays one component. Output
    is exactly what connected components needs — NOT the full pair
    list — with per-task pair work bounded by block_size/salt.
  * ``blocked_pair_edges`` — the complete pairwise list for small
    blocks (similarity scoring, near-dup review): blocks above
    ``max_block`` rows are dropped with a count so the caller sees the
    truncation (no silent caps); AQE skew-join splitting handles the
    residual reduce-side skew.

The alternative used on the default path (operators/components.py)
factors the graph through the bipartite entity↔surface projection —
cheaper still when the blocking key IS the linked entity. This module
is the general form for blocking keys with no small dictionary (e.g.
normalized surface n-grams across an open vocabulary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def salted_block_edges(df: DataFrame, block_col: str, id_col: str,
                       salt: int = 16, hub_threshold: int = 100_000) -> DataFrame:
    """(id) pairs (u, v) connecting every row sharing a block value into
    one component, with bounded per-key fan-in.

    Plan: block counts → broadcast hub set → salted star edges within
    (block, salt_bucket) → bridge edges (bucket representative → block
    minimum). Two shuffles over the id projection; no pairwise blowup.
    """
    ids = df.select(F.col(block_col).alias("b"), F.xxhash64(F.col(id_col)).alias("node"))
    counts = ids.groupBy("b").agg(F.count(F.lit(1)).alias("n"))
    hubs = F.broadcast(counts.where(F.col("n") > hub_threshold).select("b"))
    salted = ids.join(hubs.withColumn("is_hub", F.lit(True)), "b", "left").select(
        "b",
        "node",
        F.when(
            F.col("is_hub").isNotNull(), F.pmod(F.col("node"), F.lit(salt))
        ).otherwise(F.lit(0)).alias("bucket"),
    )
    # star within each (block, bucket): node -> min(node)
    mins = salted.groupBy("b", "bucket").agg(F.min("node").alias("hub_node"))
    star = (
        salted.join(mins, ["b", "bucket"])
        .where(F.col("node") != F.col("hub_node"))
        .select(F.col("node").alias("u"), F.col("hub_node").alias("v"))
    )
    # bridges: every bucket representative -> block-global minimum
    block_min = mins.groupBy("b").agg(F.min("hub_node").alias("root"))
    bridge = (
        mins.join(block_min, "b")
        .where(F.col("hub_node") != F.col("root"))
        .select(F.col("hub_node").alias("u"), F.col("root").alias("v"))
    )
    return star.union(bridge)


def _deletion_variants(s, max_len: int = 64):
    """In-row deletion neighborhood of a string Column: the string plus
    every single-character deletion (distinct). Strings longer than
    ``max_len`` contribute only themselves (bounds variant fan-out for
    pathological inputs; aliases/surface forms are short)."""
    trunc_guard = F.length(s) <= max_len
    dels = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
        lambda i: F.concat(
            F.substring(s, F.lit(1), i - 1),
            F.substring(s, i + 1, F.length(s)),
        ),
    )
    return F.array_distinct(
        F.when(trunc_guard, F.concat(F.array(s), dels)).otherwise(F.array(s))
    )


def edit_distance_pairs(left: DataFrame, right: DataFrame,
                        left_col: str, right_col: str,
                        left_id: str, right_id: str,
                        max_dist: int = 1,
                        strict_order: bool = False) -> DataFrame:
    """Typo-tolerant string join: (left_id, right_id, dist) for every
    pair with ``levenshtein <= max_dist`` — the fuzzy generalization of
    the exact broadcast alias-candidate join (operators/linking.py;
    reference analogue is the exact-match registry lookup,
    /root/reference/src/utils/crud.py:96-111).

    Physical plan (SymSpell-style deletion-neighborhood join): each side
    expands IN-ROW to its single-character-deletion variants, the sides
    equi-join on the variant, and survivors are verified with the exact
    ``levenshtein``. For ``max_dist=1`` the deletion neighborhood is a
    complete cover (any edit-distance-1 pair shares a variant), so
    recall is exactly 1.0 for strings within ``_deletion_variants``'s
    64-char fan-out cap — pinned against a brute-force oracle in tests.
    Longer strings degrade EXPLICITLY to exact-match-only (they emit
    just themselves as a variant); callers matching long fields should
    raise the cap or pre-truncate, not assume fuzzy recall there. At 100 TB this is |s|+1 variants per row and ONE equi-join
    shuffle on short strings — never an all-pairs product, never a
    theta-join. Only ``max_dist=1`` is supported (deeper neighborhoods
    grow combinatorially; compose with blocking for coarser matching).

    ``strict_order=True`` (for self-joins) pushes ``lid < rid`` into
    the join itself: every row otherwise matches ITSELF on all |s|+1 of
    its variants, so the trivial self-pairs dominate the join output
    and the distinct's shuffle; filtering inside the join removes them
    before anything materializes.
    """
    if max_dist != 1:
        raise ValueError("edit_distance_pairs supports max_dist=1 only")
    from ..functions.text import spread

    left, right = spread(left), spread(right)
    l = left.select(
        F.col(left_id).alias("lid"), F.col(left_col).alias("ls"),
        F.explode(_deletion_variants(F.col(left_col))).alias("var"),
    )
    r = right.select(
        F.col(right_id).alias("rid"), F.col(right_col).alias("rs"),
        F.explode(_deletion_variants(F.col(right_col))).alias("var"),
    )
    # the levenshtein verify lives INSIDE the join condition: on dense
    # key spaces (ids differing only in digits) most variant collisions
    # are dist>=2 false candidates, and verifying during the merge means
    # they never materialize — the downstream distinct then shuffles only
    # TRUE pairs (3 narrow columns), not every candidate with both
    # strings attached. levenshtein(.., .., threshold) short-circuits in
    # O(len) once the running distance exceeds max_dist.
    bounded = F.levenshtein(F.col("l.ls"), F.col("r.rs"), max_dist)
    # the bounded form returns -1 when the distance EXCEEDS the threshold
    cond = (F.col("l.var") == F.col("r.var")) & (bounded >= 0)
    if strict_order:
        cond = cond & (F.col("l.lid") < F.col("r.rid"))
    return (
        l.alias("l").join(r.alias("r"), cond)
        .select(
            F.col("l.lid").alias("lid"), F.col("r.rid").alias("rid"),
            bounded.alias("dist"),
        )
        .distinct()
    )


def blocked_pair_edges(df: DataFrame, block_col: str, id_col: str,
                       max_block: int = 10_000) -> tuple[DataFrame, DataFrame]:
    """Complete within-block pairs (a < b) for blocks of tolerable size.

    Returns (pairs, dropped_blocks) where dropped_blocks lists blocks
    whose size exceeded max_block with their sizes — the caller decides
    whether to route them through salted_block_edges instead. No silent
    truncation.
    """
    ids = df.select(F.col(block_col).alias("b"), F.col(id_col).alias("id"))
    counts = ids.groupBy("b").agg(F.count(F.lit(1)).alias("n"))
    ok = counts.where(F.col("n") <= max_block).select("b")
    dropped = counts.where(F.col("n") > max_block)
    small = ids.join(F.broadcast(ok), "b")
    a, b = small.alias("a"), small.alias("b")
    pairs = (
        a.join(b, (F.col("a.b") == F.col("b.b")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.b").alias("block"), F.col("a.id").alias("ida"), F.col("b.id").alias("idb"))
    )
    return pairs, dropped


def _rarity_ordered(docs: DataFrame, id_col: str, text_col: str,
                    n: int | None) -> DataFrame:
    """(doc_id, ord: array<struct<df,h>>) — each doc's DISTINCT item
    hashes sorted rarest-first under the global (df asc, hash asc)
    order. The shared head of the prefix-filter family
    (:func:`setsim_self_join`, :func:`containment_join`).

    Items are whitespace tokens (``n=None``) or word n-gram shingles;
    each item is hashed ONCE (60-bit md5 prefix — the hash IS the item
    identity, as in MinHash) so the df agg and the order-rebuild
    shuffle carry 8-byte hashes, never strings. Checkpointed: prefix
    explodes and verification arrays both read it (one row per doc)."""
    from ..functions.text import normalize_ws, portable_hash64, tokens

    if n is None:
        items = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.array_distinct(tokens(normalize_ws(F.col(text_col))))
            ).alias("tok"),
        )
    else:
        from .dedup import shingle_table

        items = shingle_table(docs, n, id_col, text_col).withColumnRenamed(
            "sh", "tok"
        )
    tok = items.select(
        "doc_id", portable_hash64(F.col("tok")).alias("h")
    ).localCheckpoint()
    dfreq = tok.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    return (
        tok.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "h"))).alias("ord"))
    ).localCheckpoint()


def setsim_self_join(docs: DataFrame, threshold: float = 0.5,
                     id_col: str = "doc_id", text_col: str = "text",
                     n: int | None = None) -> DataFrame:
    """Exact set-similarity self-join via PREFIX FILTERING — the
    AllPairs/PPJoin family (Bayardo et al., WWW'07; Xiao et al.,
    WWW'08). Returns every pair (da < db) whose item-SET Jaccard is
    >= threshold, with the exact value. Items are whitespace tokens
    (``n=None``) or distinct word n-gram shingles (``n`` set — same
    shingle semantics as ``dedup.shingle_table``, so with shingles
    this is ``ngram_jaccard_pairs`` re-solved with recall 1.0 and NO
    df_cap: prefix filtering bounds the candidate join by rarity
    instead of dropping hub shingles, and unlike the banded-LSH path
    (``dedup.jaccard_verified_pairs``) no true pair can be missed).

    Scale shape (the reason this beats a doc x doc theta-join at
    100 TB):

      * a global token order puts the RAREST tokens first
        (df asc, token-hash asc); each doc keeps only its first
        ``|T| - ceil(t*|T|) + 1`` tokens under that order. Any pair
        with Jaccard >= t must share at least one token in BOTH
        prefixes (prefix-filter theorem), so the candidate join is an
        equi-join on low-df tokens — candidate count is bounded by
        sum_tok df_prefix(tok)^2 where df_prefix counts PREFIX
        occurrences only; the frequent tokens that make the naive
        token join quadratic never enter a prefix unless a doc is
        almost all hub tokens.
      * the length filter ``t*|A| <= |B| <= |A|/t`` is applied INSIDE
        the join condition (Jaccard >= t forces size ratio >= t), so
        mismatched-size candidates never materialize.
      * the PPJoin positional filter prunes candidates inside the join
        (overlap upper bound from the matched prefix positions vs the
        pair's required overlap) before they ever materialize;
      * verification joins candidates to the per-doc sorted hash ARRAY
        (one row per doc) and intersects in-row — exact counts, no
        per-token explode, no df^2 term over the full corpus, no
        silent caps.

    Shuffles: item df (agg on 60-bit hash), per-doc order rebuild (agg
    on doc), candidate equi-join (on prefix hash), two verify joins on
    doc id. Item strings never leave the map side — every shuffle
    carries 8-byte hashes or per-doc hash arrays.
    """
    ordered = _rarity_ordered(docs, id_col, text_col, n)
    sz = F.size("ord")
    plen = (sz - F.ceil(F.lit(threshold) * sz).cast("int") + F.lit(1))
    # keep each prefix item's POSITION in the sorted order: the PPJoin
    # positional filter needs it (pos is 1-based within ``ord``)
    pref = ordered.select(
        "doc_id",
        sz.alias("sz"),
        F.posexplode(
            F.transform(F.slice("ord", F.lit(1), plen), lambda s: s["h"])
        ).alias("pos0", "h"),
    ).withColumn("pos", F.col("pos0") + 1).drop("pos0")
    a, b = pref.alias("a"), pref.alias("b")
    t = F.lit(float(threshold))
    # PPJoin positional filter (Xiao et al., WWW'08 §3.2): a shared
    # prefix item at positions (ia, ib) bounds the overlap by
    # 1 + min(sza - ia, szb - ib); Jaccard >= t needs overlap >=
    # t/(1+t) * (sza+szb), so candidates whose bound falls short are
    # pruned INSIDE the join, before the distinct — at low thresholds
    # (long prefixes) this is the difference between the candidate set
    # tracking the true pair count vs tracking sum(df_prefix^2)
    overlap_ub = F.lit(1) + F.least(
        F.col("a.sz") - F.col("a.pos"), F.col("b.sz") - F.col("b.pos")
    )
    min_overlap = (t / (F.lit(1.0) + t)) * (F.col("a.sz") + F.col("b.sz"))
    cands = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: Jaccard >= t  =>  t <= min(sz)/max(sz)
            & (F.col("b.sz") >= t * F.col("a.sz"))
            & (F.col("a.sz") >= t * F.col("b.sz"))
            & (overlap_ub.cast("double") >= min_overlap),
        )
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            F.col("a.sz").alias("sza"),
            F.col("b.sz").alias("szb"),
        )
        .distinct()
    )
    # verification: join the candidate pairs back to the per-doc hash
    # ARRAYS (already built for the prefix) and intersect IN-ROW — no
    # per-token explode (candidates x tokens/doc rows) and no groupBy;
    # overlap = |array_intersect| since items are distinct per doc. The
    # doc-array table is one row per doc, so AQE broadcasts it at small
    # scale and the verify stage goes fully map-side; at corpus scale it
    # degrades to two hash joins keyed on doc id — still never a df^2
    # term, and the arrays ride only the candidate rows
    harr = ordered.select(
        "doc_id", F.transform("ord", lambda s: s["h"]).alias("hs")
    )
    inter = (
        cands.join(
            harr.select(F.col("doc_id").alias("da"), F.col("hs").alias("ha")),
            "da",
        )
        .join(
            harr.select(F.col("doc_id").alias("db"), F.col("hs").alias("hb")),
            "db",
        )
        .select(
            "da", "db", "sza", "szb",
            F.size(F.array_intersect("ha", "hb")).alias("c"),
        )
    )
    raw = F.col("c") / (F.col("sza") + F.col("szb") - F.col("c"))
    # filter on the RAW ratio (matches the oracle's WHERE); round only
    # for output — same borderline contract as ngram_jaccard_pairs
    return inter.where(raw >= threshold).select(
        "da", "db", F.round(raw, 6).alias("jaccard")
    )


def containment_join(docs: DataFrame, threshold: float = 0.8,
                     id_col: str = "doc_id", text_col: str = "text",
                     n: int | None = 3) -> DataFrame:
    """Exact ASYMMETRIC containment self-join: every ordered pair
    (da, db), da != db, where at least ``threshold`` of da's distinct
    items also occur in db — ``|A ∩ B| / |A| >= t``. The near-superset
    case Jaccard-threshold dedup structurally misses (a tweet quoted
    inside an article has tiny Jaccard but containment ~1.0), and the
    C4/RefinedWeb-style reason to remove contained duplicates.

    Prefix filter for containment (Chaudhuri et al., ICDE'06 SSJoin):
    overlap >= ceil(t*|A|) forces A's rarest ``|A| - ceil(t*|A|) + 1``
    items (global df-asc order, the :func:`_rarity_ordered` head) to
    intersect B's FULL item set — so the candidate join probes A's
    short rare prefix against the corpus item table. A hub item enters
    a prefix only if A is almost all hubs; candidate count is
    sum_item df_prefix(item) * df(item), linear-ish in practice where
    the naive form is quadratic. The size filter ``|B| >= t*|A|``
    (overlap <= |B|) rides inside the join. Verification intersects
    the per-doc hash arrays in-row, exactly as in
    :func:`setsim_self_join`.

    Output: (da, db, containment) — da is the CONTAINED side; both
    directions of a mutual near-dup appear as two rows.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    ordered = _rarity_ordered(docs, id_col, text_col, n)
    sz = F.size("ord")
    plen = (sz - F.ceil(F.lit(threshold) * sz).cast("int") + F.lit(1))
    pref = ordered.select(
        F.col("doc_id").alias("da"),
        sz.alias("sza"),
        F.posexplode(
            F.transform(F.slice("ord", F.lit(1), plen), lambda s: s["h"])
        ).alias("pa0", "h"),
    ).withColumn("pa", F.col("pa0") + 1).drop("pa0")
    full = ordered.select(
        F.col("doc_id").alias("db"),
        sz.alias("szb"),
        F.posexplode(F.transform("ord", lambda s: s["h"])).alias("pb0", "h"),
    ).withColumn("pb", F.col("pb0") + 1).drop("pb0")
    t = F.lit(float(threshold))
    # positional filter (the containment form of PPJoin's): for a true
    # pair's FIRST shared item (rarity order is global, so everything
    # before it on either side is unshared), remaining overlap is at
    # most 1 + min(sza - pa, szb - pb), which must reach t*sza. This is
    # what keeps the full-side probe linear: hub items sit LAST in the
    # rarity order (df asc), so a hub match deep in both lists prunes
    # immediately instead of fanning out df(hub) candidates
    overlap_ub = F.lit(1) + F.least(
        F.col("sza") - F.col("pa"), F.col("szb") - F.col("pb")
    )
    cands = (
        pref.join(
            full,
            (pref.h == full.h)
            & (F.col("da") != F.col("db"))
            # overlap <= |B| and overlap >= t|A|  =>  |B| >= t|A|
            & (F.col("szb").cast("double") >= t * F.col("sza"))
            & (overlap_ub.cast("double") >= t * F.col("sza")),
        )
        .select("da", "db", "sza")
        .distinct()
    )
    harr = ordered.select(
        "doc_id", F.transform("ord", lambda s: s["h"]).alias("hs")
    )
    inter = (
        cands.join(
            harr.select(F.col("doc_id").alias("da"), F.col("hs").alias("ha")),
            "da",
        )
        .join(
            harr.select(F.col("doc_id").alias("db"), F.col("hs").alias("hb")),
            "db",
        )
        .select(
            "da", "db", "sza",
            F.size(F.array_intersect("ha", "hb")).alias("c"),
        )
    )
    raw = F.col("c") / F.col("sza")
    return inter.where(raw >= threshold).select(
        "da", "db", F.round(raw, 6).alias("containment")
    )


def sorted_neighborhood_pairs(df: DataFrame, key_col: str, id_col: str,
                              window: int = 4, partitions: int = 32) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD'95) —
    the third classic candidate-generation scheme next to LSH banding
    and prefix filtering: sort all records by a fuzzy key and pair every
    two records within ``window`` positions. Returns
    ``(ida, idb, gap)`` with ``0 < gap <= window``, ida ordered before
    idb under ``(key, id)``. Catches near-dups equi-join blocking
    misses (typos in the blocking key shift a record a few positions,
    not into a different bucket) at a guaranteed O(n * window) candidate
    count — no hub-block blowup by construction.

    Scale shape — global positions WITHOUT a global window:

      1. ``repartitionByRange`` on ``(key, id)`` (range boundaries are
         sampled, but the final position is the exact global rank, so
         the output is partitioning-independent);
      2. per-partition ``row_number`` (independent sorts) + broadcast
         exclusive prefix-sum of partition counts — the same
         bucketed-rank shape as ``encoding.dictionary_encode``, except
         buckets are RANGES so rank order equals global sort order;
      3. banded self-join: each row lands in band pos//window and also
         probes band pos//window + 1; any pair within ``window``
         positions shares one of the two band keys, so the join is an
         equi-join emitting each candidate exactly once.

    Shuffles: one range shuffle, one count agg, one band equi-join of
    (id, pos) pairs — keys never ride the band join.
    """
    keyed = (
        df.select(F.col(id_col).alias("id"), F.col(key_col).alias("key"))
        .where(F.col("key").isNotNull())
        .repartitionByRange(partitions, "key", "id")
        .withColumn("pid", F.spark_partition_id())
    )
    in_part = Window.partitionBy("pid").orderBy("key", "id")
    ranked = keyed.withColumn(
        "rank", (F.row_number().over(in_part) - 1).cast("long")
    ).localCheckpoint()
    counts = ranked.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
    off_w = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = counts.select(
        "pid", (F.sum("n").over(off_w) - F.col("n")).alias("offset")
    )
    pos = (
        ranked.join(F.broadcast(offsets), "pid")
        .select("id", (F.col("offset") + F.col("rank")).alias("pos"))
    )
    w = F.lit(int(window))
    band = F.floor(F.col("pos") / w)
    left = pos.select(
        "id", "pos", F.explode(F.array(band, band + 1)).alias("band")
    )
    right = pos.select(
        F.col("id").alias("idb"), F.col("pos").alias("posb"), band.alias("band")
    )
    return (
        left.join(right, "band")
        .where((F.col("posb") > F.col("pos")) & (F.col("posb") - F.col("pos") <= w))
        .select(
            F.col("id").alias("ida"),
            "idb",
            (F.col("posb") - F.col("pos")).alias("gap"),
        )
    )
