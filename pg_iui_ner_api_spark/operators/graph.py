"""Graph analytics over the constructed knowledge graph.

Once the KG pipeline has materialized node/edge tables (the reference's
end product is exactly such an edge list —
/root/reference/src/routers/main_endpoints.py emits per-document entity
rows; our ``operators/triples.py`` assembles them into (subj, pred,
obj)), the questions users actually ask are graph queries: who is
connected to whom within k hops, which entities are central, how
clustered is the neighborhood. These are beyond-reference operators in
the same sense as the dedup/ANN family: the query surface a 100 TB KG
needs, built as pure DataFrame algebra.

Every operator here works on a plain ``(src, dst)`` edge DataFrame, so
it applies equally to pipeline output (``kg_edges``) and to any
co-occurrence edge list derived with :func:`cooccurrence_edges`.

Scale shapes (the whole point of each implementation):

  * ``cooccurrence_edges`` — self-join on the group key; quadratic in
    group size, so hub groups are cap-able with an explicit dropped
    report (same contract as the dedup family's hub-shingle report:
    never silently).
  * ``khop`` — frontier-at-a-time BFS: k joins, each frontier ⋈ edges;
    the frontier is usually tiny relative to the edge table, so the
    join broadcasts the frontier and the EDGE TABLE NEVER SHUFFLES.
  * ``pagerank`` — the edge table is hash-partitioned on ``src`` ONCE
    and persisted; every iteration shuffles only the rank vector
    (N rows, two narrow columns), never the edges. Ranks are
    localCheckpointed per iteration so the iterative lineage stays
    flat (no exponential re-planning).
  * ``triangle_count`` — degree-ordered orientation before the wedge
    join bounds every node's out-degree by O(sqrt(m)) (standard
    triangle-listing bound), so the wedge join cannot blow up on hub
    nodes the way a naive a<b three-way join does.

Everything is Column expressions + joins — zero Python on the hot path
— and the (src,dst)-canonical operators have exact DuckDB oracles in
``__spark_entry__`` (degrees/k-hop/PageRank/triangles all being plain
SQL over the same derived edge list).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


# ---------------------------------------------------------------------------
# edge-list construction
# ---------------------------------------------------------------------------
def cooccurrence_edges(
    df: DataFrame,
    group_col: str,
    node_col: str,
    max_group: int | None = None,
) -> DataFrame:
    """Distinct undirected co-occurrence edges ``(src < dst)``.

    Two nodes are linked iff they appear in the same group (same
    document, same order, same session). This is the standard entity
    co-mention graph constructor: for the KG corpus the group is the
    doc and the node is the linked entity id.

    Plan: project → (optional hub-group filter) → self-join on the
    group key → distinct. The self-join shuffles only the two join
    columns; output is quadratic in GROUP size (not corpus size), so
    hub groups dominate. ``max_group`` drops groups larger than the
    cap — use :func:`cooccurrence_dropped_groups` to report exactly
    which were dropped (never silently, per the dedup-family contract).
    """
    pairs = df.select(
        F.col(group_col).alias("g"), F.col(node_col).alias("n")
    ).distinct()
    if max_group is not None:
        sizes = pairs.groupBy("g").count().filter(F.col("count") <= max_group)
        pairs = pairs.join(sizes.select("g"), "g")
    a = pairs.alias("a")
    b = pairs.alias("b")
    return (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.n") < F.col("b.n")))
        .select(F.col("a.n").alias("src"), F.col("b.n").alias("dst"))
        .distinct()
    )


def cooccurrence_dropped_groups(
    df: DataFrame, group_col: str, node_col: str, max_group: int
) -> DataFrame:
    """The groups a ``max_group`` cap would drop: ``(group, n_nodes)``."""
    return (
        df.select(F.col(group_col).alias("g"), F.col(node_col).alias("n"))
        .distinct()
        .groupBy("g")
        .agg(F.count("*").alias("n_nodes"))
        .filter(F.col("n_nodes") > max_group)
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Both directions of a canonical (src<dst) edge list — map-only."""
    return edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def cooccurrence_pmi(
    df: DataFrame,
    group_col: str,
    node_col: str,
    min_pairs: int = 1,
) -> DataFrame:
    """PMI-weighted co-occurrence edges ``(src, dst, n_pairs, pmi)``.

    pmi = ln(P(a,b) / (P(a)·P(b))) with probabilities over GROUPS:
    P(a) = groups containing a / N, P(a,b) = groups containing both / N.
    This is the standard association score that separates "co-mentioned
    because both are everywhere" hubs from genuinely related pairs —
    the edge-weighting step a raw co-occurrence KG needs before ranking.

    Plan: the pair counts come from the same self-join as
    :func:`cooccurrence_edges` but keep ``count(*)``; marginals are a
    single narrow aggregate (node, n_groups) joined back twice — both
    sides keyed on a node id, broadcast-able at realistic node counts
    relative to pairs. N (total groups) is a bounded scalar collect.
    ``min_pairs`` prunes the long tail before the marginal joins.
    """
    pairs = df.select(
        F.col(group_col).alias("g"), F.col(node_col).alias("n")
    ).distinct()
    n_groups = pairs.select("g").distinct().count()
    marg = pairs.groupBy("n").agg(F.count(F.lit(1)).alias("n_groups"))
    a = pairs.alias("a")
    b = pairs.alias("b")
    co = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.n") < F.col("b.n")))
        .groupBy(F.col("a.n").alias("src"), F.col("b.n").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .filter(F.col("n_pairs") >= min_pairs)
    )
    ma = marg.select(F.col("n").alias("src"), F.col("n_groups").alias("na"))
    mb = marg.select(F.col("n").alias("dst"), F.col("n_groups").alias("nb"))
    return co.join(ma, "src").join(mb, "dst").select(
        "src",
        "dst",
        "n_pairs",
        F.round(
            F.log(
                (F.col("n_pairs").cast("double") * F.lit(float(n_groups)))
                / (F.col("na").cast("double") * F.col("nb").cast("double"))
            ),
            6,
        ).alias("pmi"),
    )


# ---------------------------------------------------------------------------
# degrees
# ---------------------------------------------------------------------------
def degrees(edges: DataFrame) -> DataFrame:
    """Undirected degree per node from a canonical (src<dst) edge list.

    Plan: unionAll both endpoint projections → groupBy(node). One
    shuffle on the node id with map-side partial counts; the narrowest
    possible aggregate.
    """
    ends = edges.select(F.col("src").alias("node")).unionAll(
        edges.select(F.col("dst").alias("node"))
    )
    return ends.groupBy("node").agg(F.count("*").alias("degree"))


# ---------------------------------------------------------------------------
# k-hop BFS
# ---------------------------------------------------------------------------
def khop(
    edges_sym: DataFrame,
    seeds: Sequence,
    k: int,
    materialize: bool = True,
) -> DataFrame:
    """BFS distances ``(node, dist)`` for every node within ``k`` hops
    of ``seeds`` over a SYMMETRIC edge list (see :func:`symmetrize`).

    Frontier-at-a-time: each hop joins the current frontier against the
    edges, anti-joins the visited set, and unions into it. The frontier
    (and visited set, ≤ reachable nodes) is broadcast, so the edge table
    — the only big relation — never shuffles and is scanned once per
    hop with the frontier filter pushed into the hash join. For frontier
    sizes beyond broadcast limits drop the hint and let AQE pick
    (the loop structure is unchanged).

    ``k`` is small and fixed (a user query parameter), so the unioned
    lineage stays shallow. ``materialize`` (default) localCheckpoints
    the edge relation once so a DERIVED edge list (e.g. a co-occurrence
    self-join) isn't recomputed on every hop; pass ``False`` when the
    edges are already file-backed and a full copy would cost more than
    k cheap re-scans.
    """
    spark = edges_sym.sparkSession
    if materialize:
        edges_sym = edges_sym.select("src", "dst").localCheckpoint()
    visited = spark.createDataFrame(
        [(s, 0) for s in seeds], schema=["node", "dist"]
    )
    frontier = visited.select("node")
    for d in range(1, k + 1):
        nxt = (
            edges_sym.join(F.broadcast(frontier), edges_sym.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(F.broadcast(visited.select("node")), "node", "left_anti")
        )
        visited = visited.unionAll(nxt.select("node", F.lit(d).alias("dist")))
        frontier = nxt
    return visited


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------
def pagerank(
    edges_sym: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank ``(node, pr)`` over a symmetric edge
    list whose node set is the edge endpoints (hence no dangling nodes:
    every node has out-degree ≥ 1 by construction).

    The iterative-DataFrame shape that survives 100×:

      * ``(src, dst, od)`` — edges pre-joined with out-degree — is
        hash-partitioned on ``src`` once and eagerly localCheckpointed;
        EVERY iteration reuses that materialization (and its
        partitioning) and shuffles only the rank vector
        (N rows × 2 narrow columns).
      * ranks are ``localCheckpoint``-ed each iteration, truncating the
        lineage so plan size (and recovery cost) stays constant in
        ``iters`` instead of growing a join-tree per round.
      * N (node count) is a bounded scalar — same class as the
        centroid-stats collect in ``operators/ann.py``.
    """
    return _pagerank_loop(
        edges_sym,
        iters,
        damping,
        init=lambda n: F.lit(1.0 / n),
        tele=lambda n: F.lit((1.0 - damping) / n),
    )


def _pagerank_loop(edges_sym, iters, damping, init, tele) -> DataFrame:
    """Shared power-iteration body of :func:`pagerank` and
    :func:`personalized_pagerank`: ``init(n)``/``tele(n)`` produce the
    initial-rank and teleport Column expressions over the node column
    (uniform for PageRank, seed-concentrated for PPR); everything else
    — edge materialization, degree join, per-round rank shuffle and
    checkpoint — is identical by construction."""
    # The input is usually a DERIVED relation (a co-occurrence self-join),
    # and this operator consumes it twice (degree agg + join) before
    # iterating — checkpoint it once so the expensive upstream runs once.
    # Eager localCheckpoint (not persist/unpersist): it materializes NOW,
    # keeps its partitioning, and stays alive for the returned lazy plan —
    # a persist would have to outlive this function to do that, and an
    # unpersist-on-return would silently recompute per iteration.
    es = edges_sym.select("src", "dst").localCheckpoint()
    deg = es.groupBy("src").agg(F.count("*").alias("od"))
    linked = (
        es.join(deg, "src")
        .select("src", "dst", "od")
        .repartition("src")
        .localCheckpoint()
    )
    nodes = linked.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    ranks = nodes.select("node", init(n).alias("pr"))
    tele_col = tele(n)
    for _ in range(iters):
        contrib = (
            linked.join(ranks, linked.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("od")).alias("m"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    tele_col
                    + F.lit(damping) * F.coalesce(F.col("m"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


# ---------------------------------------------------------------------------
# label propagation (community detection)
# ---------------------------------------------------------------------------
def label_propagation(edges_sym: DataFrame, iters: int = 3) -> DataFrame:
    """Synchronous label propagation ``(node, lbl)`` over a symmetric
    edge list: labels start as node ids; each round every node adopts
    the most frequent label among its neighbors, ties broken to the
    SMALLEST label so the algorithm is deterministic (classic LPA is
    tie-random; that would be un-oracle-able).

    Same iterative-DataFrame scale shape as :func:`pagerank`: the edge
    table is hash-partitioned on the join key once and persisted, every
    round shuffles only (node, label) pairs + narrow count rows, and the
    label vector is localCheckpoint-ed so lineage stays flat. The
    argmax-with-tiebreak is a single ``max(struct(count, -label))`` —
    no window, no second shuffle.
    """
    # eager localCheckpoint for the same reason as pagerank: materialize
    # the partitioned edge relation once for all rounds of the lazy plan
    e = edges_sym.select("src", "dst").repartition("dst").localCheckpoint()
    labels = (
        e.select(F.col("src").alias("node")).distinct()
        .select("node", F.col("node").alias("lbl"))
    )
    for _ in range(iters):
        cnt = (
            e.join(labels, e.dst == labels.node)
            .groupBy("src", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            cnt.groupBy("src")
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("lbl")).alias("neg_lbl"))
                ).alias("m")
            )
            .select(F.col("src").alias("node"), (-F.col("m.neg_lbl")).alias("lbl"))
            .localCheckpoint(eager=False)
        )
    return labels


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------
def orient_by_degree(edges: DataFrame) -> DataFrame:
    """Re-orient a canonical (src<dst) edge list so every edge points
    from the endpoint with the smaller ``(degree, id)`` to the larger.

    This is the standard triangle-listing preparation: under the
    degree total order every node's out-degree is O(sqrt(m)), so the
    wedge self-join in :func:`triangle_count` is bounded even when the
    raw graph has hub nodes of huge degree. Two joins against the
    degree table (N rows — broadcast-able at any realistic node count
    relative to edges; left unhinted so AQE picks).
    """
    deg = degrees(edges)
    d1 = deg.select(
        F.col("node").alias("src"), F.col("degree").alias("d_src")
    )
    d2 = deg.select(
        F.col("node").alias("dst"), F.col("degree").alias("d_dst")
    )
    e = edges.join(d1, "src").join(d2, "dst")
    fwd = (F.col("d_src") < F.col("d_dst")) | (
        (F.col("d_src") == F.col("d_dst")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Total triangle count of a canonical (src<dst) edge list, as a
    single-row DataFrame ``(n_triangles)``.

    Shape: degree-orient → wedge join (o1.dst = o2.src) → close the
    wedge against the oriented edges on (src, dst). Under the degree
    orientation each triangle appears exactly once as a wedge at its
    smallest-ordered vertex, and the wedge join's per-key fan-out is
    O(sqrt(m)) — the difference between a plan that finishes and one
    that explodes on the first celebrity entity. The result is
    orientation-invariant, so the SQL oracle can use the naive a<b
    three-way join and must agree exactly.
    """
    # checkpoint the (derived) edge list once: orientation consumes it
    # four times (two degree projections + two marginal joins)
    e0 = edges.select("src", "dst").localCheckpoint()
    o = orient_by_degree(e0).persist()
    o1 = o.alias("o1")
    o2 = o.alias("o2")
    wedges = o1.join(o2, F.col("o1.dst") == F.col("o2.src")).select(
        F.col("o1.src").alias("w_src"), F.col("o2.dst").alias("w_dst")
    )
    closed = wedges.join(
        o, (F.col("w_src") == F.col("src")) & (F.col("w_dst") == F.col("dst"))
    )
    out = closed.agg(F.count("*").alias("n_triangles"))
    result = out.localCheckpoint()
    o.unpersist()
    return result


def node2vec_walks(
    edges_sym: DataFrame,
    walk_len: int = 3,
    walks_per_node: int = 1,
    p: int = 1,
    q: int = 1,
    seed: str = "n2v",
) -> DataFrame:
    """Deterministic node2vec SECOND-ORDER biased walks ``(start,
    walk_no, step, node)`` (Grover & Leskovec, KDD 2016): the step from
    v (arrived from t) weights neighbor x by 1/p if x == t (return),
    1 if x adjacent to t (triangle), 1/q otherwise (outward) — the
    BFS/DFS interpolation knob DeepWalk's uniform walk lacks.

    ``p`` and ``q`` are POSITIVE INTEGER inverse biases; weights are
    held as the exact integers w_return = q, w_triangle = p*q,
    w_outward = p (the 1/p : 1 : 1/q ratios scaled by p*q), so every
    cumulative sum is integer-exact and the selection — smallest
    neighbor idx whose running weight sum exceeds
    ``portable_hash64(seed|start|walk_no|t) % total_weight`` — is
    bit-replayable in DuckDB. With p == q == 1 the selection provably
    degenerates to ``idx = hash % degree``, i.e. exactly
    :func:`random_walks` (pinned in pytest). Step 1 has no predecessor
    and is uniform, the standard first step.

    Scale shape: unlike the first-order walk (ONE (node, idx) probe per
    step), the biased step inherently fans deg(current) candidate rows
    per walk — each needs the is-neighbor-of-predecessor test, one hash
    join against the edge set on (candidate, prev) — plus one per-walk
    window cumsum over the candidates. A hub transition costs deg(hub)
    rows, so run this on a degree-capped relatedness graph (the
    cooccurrence ``max_group`` / link-pred cap family), like every
    wedge-fan operator in this module. Neighbor index and edge set are
    partitioned once and localCheckpointed; per round only the
    candidate frontier shuffles.
    """
    from ..functions.text import portable_hash64

    if walk_len < 1 or walks_per_node < 1:
        raise ValueError("walk_len and walks_per_node must be >= 1")
    if p < 1 or q < 1:
        raise ValueError("p and q must be positive integers")
    es = edges_sym.select("src", "dst").distinct().localCheckpoint()
    w_nbr = Window.partitionBy("src").orderBy("dst")
    nbr = (
        es.withColumn("idx", (F.row_number().over(w_nbr) - 1).cast("long"))
        .select(F.col("src").alias("node"), "idx", F.col("dst").alias("nxt"))
        .repartition("node")
        .localCheckpoint()
    )
    adj = es.select(
        F.col("src").alias("nxt"), F.col("dst").alias("prev"),
        F.lit(1).alias("_adj"),
    )
    starts = (
        nbr.select("node")
        .distinct()
        .select(
            F.col("node").alias("start"),
            F.explode(
                F.sequence(F.lit(0), F.lit(walks_per_node - 1))
            ).alias("walk_no"),
        )
    )
    cur = starts.select(
        "start", "walk_no", F.col("start").alias("node"),
        F.lit(None).cast(nbr.schema["node"].dataType).alias("prev"),
    )
    out = cur.select("start", "walk_no", F.lit(0).alias("step"), "node")
    w_cum = (
        Window.partitionBy("start", "walk_no")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("start", "walk_no")
    for t in range(1, walk_len + 1):
        h = portable_hash64(
            F.concat_ws(
                "|",
                F.lit(seed),
                F.col("start").cast("string"),
                F.col("walk_no").cast("string"),
                F.lit(str(t)),
            )
        )
        cands = (
            cur.join(nbr, "node")
            .join(adj, ["nxt", "prev"], "left")
            .withColumn(
                "w",
                F.when(F.col("prev").isNull(), F.lit(1))
                .when(F.col("nxt") == F.col("prev"), F.lit(q))
                .when(F.col("_adj") == 1, F.lit(p * q))
                .otherwise(F.lit(p))
                .cast("long"),
            )
        )
        picked = (
            cands.withColumn("cum", F.sum("w").over(w_cum))
            .withColumn("total", F.sum("w").over(w_tot))
            .where(F.col("cum") > F.pmod(h, F.col("total")))
            .groupBy("start", "walk_no")
            .agg(F.min(F.struct("idx", "nxt", "node")).alias("_s"))
        )
        stepped = picked.select(
            "start",
            "walk_no",
            F.col("_s.nxt").alias("node"),
            F.col("_s.node").alias("prev"),
        ).localCheckpoint(eager=False)
        out = out.unionAll(
            stepped.select("start", "walk_no", F.lit(t).alias("step"), "node")
        )
        cur = stepped
    return out


def _edge_support(e: DataFrame) -> DataFrame:
    """Per-edge triangle support of a canonical (src<dst) edge list:
    ``(src, dst, support)`` for edges in >= 1 triangle. Degree-oriented
    wedge closure (O(sqrt m) fan-out per key); each closed triangle
    emits its THREE edges re-canonicalized via in-row least/greatest,
    so support is one partial-aggregable groupBy over id pairs."""
    o = orient_by_degree(e).persist()
    o1 = o.alias("o1")
    o2 = o.alias("o2")
    wedges = o1.join(o2, F.col("o1.dst") == F.col("o2.src")).select(
        F.col("o1.src").alias("a"),
        F.col("o1.dst").alias("b"),
        F.col("o2.dst").alias("c"),
    )
    closed = wedges.join(
        o, (F.col("a") == F.col("src")) & (F.col("c") == F.col("dst"))
    ).select("a", "b", "c")
    tri_edges = closed.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("a", "b").alias("src"),
                    F.greatest("a", "b").alias("dst"),
                ),
                F.struct(
                    F.least("b", "c").alias("src"),
                    F.greatest("b", "c").alias("dst"),
                ),
                F.struct(
                    F.least("a", "c").alias("src"),
                    F.greatest("a", "c").alias("dst"),
                ),
            )
        ).alias("ed")
    ).select("ed.src", "ed.dst")
    supp = tri_edges.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("support")
    ).localCheckpoint()
    o.unpersist()
    return supp


def ktruss(
    edges: DataFrame, k: int, rounds: int, materialize: bool = True
) -> DataFrame:
    """Bounded-round k-truss peeling over a canonical (src<dst) edge
    list: ``rounds`` rounds of "drop every edge in fewer than k-2
    triangles", returning the surviving edges with their support INSIDE
    the surviving subgraph — ``(src, dst, support)``.

    The k-truss (Cohen 2008) is the edge-analogue of the k-core and a
    stronger dense-community filter: every surviving edge is embedded
    in k-2 triangles of survivors, so loosely-attached spokes that
    survive k-core peeling (degree alone) fall away. On a KG
    relatedness graph it isolates the clique-ish cores worth clustering.
    Equal to the true k-truss whenever ``rounds`` >= the peeling depth
    — same bounded-iteration contract as :func:`kcore`/:func:`sssp`
    (the caller asserts convergence by checking one extra round changes
    nothing).

    Scale shape: each round is one degree-oriented wedge closure
    (per-key fan-out O(sqrt m), hub-safe) + one partial-aggregable
    support count over 8-byte id pairs + one semi join; the edge list
    shrinks monotonically and is localCheckpointed per round so lineage
    stays flat. Nothing ever leaves (id, id, count) width.
    """
    if k < 3:
        raise ValueError("k must be >= 3 (k=3 already requires triangles)")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = edges.select("src", "dst").distinct()
    if materialize:
        e = e.localCheckpoint()
    for _ in range(rounds):
        supp = _edge_support(e)
        e = e.join(
            supp.where(F.col("support") >= k - 2).select("src", "dst"),
            ["src", "dst"],
            "left_semi",
        )
        if materialize:
            e = e.localCheckpoint()
    final = _edge_support(e)
    return e.join(final, ["src", "dst"], "left").select(
        "src",
        "dst",
        F.coalesce("support", F.lit(0)).cast("long").alias("support"),
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient of a canonical (src<dst)
    edge list: ``(node, degree, n_triangles, lcc)`` with
    ``lcc = 2*T(v) / (deg(v)*(deg(v)-1))`` and 0 when deg < 2 (Watts &
    Strogatz, Nature 1998). The per-entity cohesion score for KG QA:
    an over-merged hub alias reads high-degree/low-lcc (its neighbors
    come from unrelated senses and don't interconnect), while a
    clique-like entity neighborhood reads lcc ~ 1.

    Scale shape: the SAME degree-oriented wedge closure as
    :func:`triangle_count` (per-key fan-out O(sqrt m), hub-safe); each
    closed triangle emits its THREE vertices through one in-row array
    explode, so the per-node count is a partial-aggregable groupBy over
    8-byte node ids. Degrees are one narrow groupBy of the symmetrized
    list. The final ratio is one IEEE double division rounded at 6dp —
    hash-safe cross-engine (the graph_jaccard discipline).
    """
    e0 = edges.select("src", "dst").distinct().localCheckpoint()
    o = orient_by_degree(e0).persist()
    o1 = o.alias("o1")
    o2 = o.alias("o2")
    wedges = o1.join(o2, F.col("o1.dst") == F.col("o2.src")).select(
        F.col("o1.src").alias("a"),
        F.col("o1.dst").alias("b"),
        F.col("o2.dst").alias("c"),
    )
    closed = wedges.join(
        o, (F.col("a") == F.col("src")) & (F.col("c") == F.col("dst"))
    )
    tri = (
        closed.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        e0.select(F.col("src").alias("node"))
        .unionAll(e0.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    t = F.coalesce("n_triangles", F.lit(0)).cast("long")
    out = deg.join(tri, "node", "left").select(
        "node",
        "degree",
        t.alias("n_triangles"),
        F.when(F.col("degree") < 2, F.lit(0.0))
        .otherwise(
            F.round(
                (F.lit(2.0) * t) / (F.col("degree") * (F.col("degree") - 1)),
                6,
            )
        )
        .alias("lcc"),
    )
    result = out.localCheckpoint()
    o.unpersist()
    return result


# ---------------------------------------------------------------------------
# link prediction
# ---------------------------------------------------------------------------
def adamic_adar(
    edges: DataFrame,
    max_neighbors: int | None = None,
    min_cn: int = 2,
) -> DataFrame:
    """Link-prediction scores for NON-adjacent node pairs of a canonical
    (src<dst) edge list: ``(src, dst, common_neighbors, adamic_adar)``
    with src < dst, keeping pairs sharing >= ``min_cn`` neighbors.

    adamic_adar(u, v) = sum over common neighbors z of 1 / ln(deg(z))
    (Adamic & Adar 2003) — the standard "friends-of-friends" candidate
    scorer for suggesting missing KG edges; ``common_neighbors`` is the
    plain co-neighbor count. A shared neighbor z always has deg >= 2, so
    ln(deg) never vanishes.

    Scale shape: wedge enumeration centered at z is inherently
    sum(deg(z)^2) — a celebrity entity with 10^6 neighbors would emit
    10^12 wedges, so this operator carries the SAME hub-cap contract as
    ``cooccurrence_edges``: pass ``max_neighbors`` to exclude hub
    centers, and report exactly what was dropped via
    :func:`adamic_adar_dropped_hubs` (never silently). A dropped hub
    stops contributing as a *shared neighbor*; its own candidate pairs
    survive through its non-hub neighbors. After the cap the wedge join
    fans out <= max_neighbors per center; the pair aggregation is a
    partial-aggregable groupBy on the (u, v) key, and existing edges
    are removed with an anti join against the (already canonical) edge
    list. Zero Python anywhere.
    """
    e0 = edges.select("src", "dst").localCheckpoint()  # 3 consumers
    deg = degrees(e0)
    nbr = symmetrize(e0).select(F.col("src").alias("z"), F.col("dst").alias("u"))
    zdeg = deg.select(F.col("node").alias("z"), "degree")
    if max_neighbors is not None:
        zdeg = zdeg.filter(F.col("degree") <= max_neighbors)
    # the degree join doubles as the hub filter: capped centers vanish
    nbr = nbr.join(zdeg, "z")
    a, b = nbr.alias("a"), nbr.alias("b")
    wedges = a.join(b, "z").where(F.col("a.u") < F.col("b.u")).select(
        F.col("a.u").alias("src"),
        F.col("b.u").alias("dst"),
        (1.0 / F.log(F.col("a.degree"))).alias("w"),
    )
    scored = wedges.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum("w").alias("adamic_adar"),
    )
    return scored.join(e0, ["src", "dst"], "left_anti").filter(
        F.col("common_neighbors") >= min_cn
    )


def adamic_adar_dropped_hubs(edges: DataFrame, max_neighbors: int) -> DataFrame:
    """The never-silent half of the :func:`adamic_adar` cap contract:
    ``(node, degree)`` of every center the cap excluded."""
    return degrees(edges.select("src", "dst")).filter(
        F.col("degree") > max_neighbors
    )


def jaccard_link(
    edges: DataFrame,
    max_neighbors: int | None = None,
    min_cn: int = 2,
) -> DataFrame:
    """Neighborhood-Jaccard link-prediction scores for non-adjacent
    node pairs of a canonical (src<dst) edge list:
    ``(src, dst, common_neighbors, jaccard)`` with src < dst.

    jaccard(u, v) = |N(u) ∩ N(v)| / |N(u) ∪ N(v)| — the degree-
    normalized companion of :func:`adamic_adar` (Liben-Nowell & Kleinberg
    2003's strongest simple baseline). The union size is computed as
    deg(u) + deg(v) - common, so it needs no second wedge pass: one
    wedge enumeration + two narrow degree joins.

    Carries the SAME hub-cap contract as :func:`adamic_adar` — pass
    ``max_neighbors`` to exclude hub *centers* from wedge enumeration
    (report the exclusions via :func:`adamic_adar_dropped_hubs`; the
    contract is shared, so is the reporter). Degrees in the denominator
    are always the TRUE degrees — the cap bounds enumeration cost, it
    does not redefine the statistic for surviving pairs beyond the
    wedges it drops. Per-pair division is a single IEEE double op —
    exact-deterministic across engines (unlike float *sums*, which this
    operator avoids entirely: both numerator and denominator are ints).
    """
    e0 = edges.select("src", "dst").localCheckpoint()  # 4 consumers
    deg = degrees(e0)
    nbr = symmetrize(e0).select(F.col("src").alias("z"), F.col("dst").alias("u"))
    zdeg = deg.select(F.col("node").alias("z"), "degree")
    if max_neighbors is not None:
        zdeg = zdeg.filter(F.col("degree") <= max_neighbors)
    nbr = nbr.join(zdeg, "z").select("z", "u")
    a, b = nbr.alias("a"), nbr.alias("b")
    common = (
        a.join(b, "z")
        .where(F.col("a.u") < F.col("b.u"))
        .groupBy(F.col("a.u").alias("src"), F.col("b.u").alias("dst"))
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
    )
    du = deg.select(F.col("node").alias("src"), F.col("degree").alias("d_src"))
    dv = deg.select(F.col("node").alias("dst"), F.col("degree").alias("d_dst"))
    scored = (
        common.join(du, "src")
        .join(dv, "dst")
        .select(
            "src",
            "dst",
            "common_neighbors",
            (
                F.col("common_neighbors")
                / (F.col("d_src") + F.col("d_dst") - F.col("common_neighbors"))
            ).alias("jaccard"),
        )
    )
    return scored.join(e0, ["src", "dst"], "left_anti").filter(
        F.col("common_neighbors") >= min_cn
    )


# ---------------------------------------------------------------------------
# weighted shortest paths
# ---------------------------------------------------------------------------
def sssp(
    edges_w: DataFrame,
    source,
    rounds: int,
    materialize: bool = True,
) -> DataFrame:
    """Single-source shortest paths ``(node, dist)`` over a DIRECTED
    weighted edge list ``(src, dst, w)`` — frontier Bellman-Ford,
    ``rounds`` relaxation rounds, so the result is exactly the minimum
    distance over all paths of <= ``rounds`` edges (equal to true SSSP
    whenever ``rounds`` >= the shortest-path tree depth; the caller
    asserts convergence by checking one extra round changes nothing,
    or picks ``rounds`` >= known diameter).

    Scale shape (the iterative-DataFrame trio shared with
    :func:`pagerank` / :func:`khop`):

      * the edge table is materialized ONCE and never shuffles — each
        round joins it against the broadcast *frontier* (only the nodes
        improved last round, usually a vanishing fraction of N);
      * per round, one union + one partial-aggregable min-groupBy over
        the narrow (node, dist) vector — never the edges;
      * dist is localCheckpoint-ed per round so lineage stays flat.

    Weights must be non-negative (Bellman-Ford with bounded rounds is
    still well-defined for negative weights, but "shortest" then
    depends on ``rounds``; the oracle replays the same bound either
    way). Integer weights make every distance an exact integer sum —
    no float-aggregation drift anywhere.
    """
    spark = edges_w.sparkSession
    e = edges_w.select("src", "dst", "w")
    if materialize:
        e = e.localCheckpoint()
    dist = spark.createDataFrame([(source, 0)], schema=["node", "dist"])
    frontier = dist
    for _ in range(rounds):
        merged = _sssp_relax_round(e, dist, frontier).localCheckpoint()
        # next frontier = nodes whose dist improved this round
        frontier = merged.join(
            dist.withColumnRenamed("dist", "old"), "node", "left"
        ).where(F.col("old").isNull() | (F.col("dist") < F.col("old"))).select(
            "node", "dist"
        )
        dist = merged
    return dist


def _sssp_relax_round(e: DataFrame, dist: DataFrame, frontier: DataFrame) -> DataFrame:
    """One Bellman-Ford round: relax every edge leaving the (broadcast)
    frontier, min-merge into the running distance vector. Split out so
    the per-round physical plan is pinnable (the loop checkpoints each
    round, which hides the join tree behind an RDD scan)."""
    relaxed = (
        e.join(F.broadcast(frontier), e.src == frontier.node)
        .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        .groupBy("node")
        .agg(F.min("dist").alias("dist"))
    )
    return (
        dist.unionAll(relaxed)
        .groupBy("node")
        .agg(F.min("dist").alias("dist"))
    )


# ---------------------------------------------------------------------------
# bounded transitive closure (taxonomy ancestors)
# ---------------------------------------------------------------------------
def transitive_closure(
    edges: DataFrame,
    max_depth: int,
    materialize: bool = True,
) -> DataFrame:
    """Bounded-depth reachability closure ``(node, ancestor, depth)``
    over a DIRECTED edge list ``(src, dst)`` — every (node, ancestor)
    pair connected by a directed path of <= ``max_depth`` edges, with
    ``depth`` the MINIMUM hop count. The classic KG type-hierarchy
    query ("all ancestors of every entity under the is_a taxonomy").

    Scale shape — iterative DOUBLING, not frontier-at-a-time: round i
    holds the exact closure up to 2^i hops and self-joins it
    (reach(a,b,d1) ⋈ reach(b,c,d2) → reach(a,c,d1+d2)), so a depth-D
    taxonomy needs ceil(log2 D) shuffles instead of D. min-groupBy per
    round keeps one row per pair (partial-aggregable, narrow 3-int
    rows); localCheckpoint per round keeps lineage flat. For a DAG of
    bounded fan-up (taxonomies: each type has few parents) the closure
    is O(nodes × depth) rows — linear, not quadratic.

    Rows past ``max_depth`` are filtered per round, which also caps the
    blow-up on cyclic inputs (a cycle never creates pairs beyond the
    depth bound; min-depth semantics stay exact).
    """
    e = edges.select(
        F.col("src").alias("node"), F.col("dst").alias("ancestor")
    ).distinct()
    if materialize:
        e = e.localCheckpoint()
    closure = e.select("node", "ancestor", F.lit(1).alias("depth"))
    reach = 1
    while reach < max_depth:
        a = closure.alias("a")
        b = closure.alias("b")
        step = (
            a.join(b, F.col("a.ancestor") == F.col("b.node"))
            .select(
                F.col("a.node").alias("node"),
                F.col("b.ancestor").alias("ancestor"),
                (F.col("a.depth") + F.col("b.depth")).alias("depth"),
            )
            .where(F.col("depth") <= max_depth)
        )
        closure = (
            closure.unionAll(step)
            .groupBy("node", "ancestor")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint()
        )
        reach *= 2
    return closure


def personalized_pagerank(
    edges_sym: DataFrame,
    seeds: Sequence,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Personalized (seeded-teleport) PageRank ``(node, pr)`` — the
    canonical "entities most related to X" KG query: random walks
    restart at the SEEDS instead of uniformly, so rank concentrates in
    the seeds' neighborhood (Jeh & Widom 2003).

    Identical iterative shape to :func:`pagerank` (shared
    :func:`_pagerank_loop`). The only change is the teleport vector:
    ``(1-d)/|seeds|`` on seeds, 0 elsewhere, which is also the initial
    rank (walk starts at the seeds).
    """
    seeds = list(seeds)
    is_seed = F.col("node").isin(seeds)
    return _pagerank_loop(
        edges_sym,
        iters,
        damping,
        init=lambda n: F.when(is_seed, F.lit(1.0 / len(seeds))).otherwise(
            F.lit(0.0)
        ),
        tele=lambda n: F.when(
            is_seed, F.lit((1.0 - damping) / len(seeds))
        ).otherwise(F.lit(0.0)),
    )


def random_walks(
    edges_sym: DataFrame,
    walk_len: int = 3,
    walks_per_node: int = 1,
    seed: str = "w0",
) -> DataFrame:
    """Deterministic fixed-length random walks ``(start, walk_no, step,
    node)`` over a symmetric edge list — the DeepWalk/node2vec corpus
    generator (Perozzi et al. 2014): every node starts
    ``walks_per_node`` walks of ``walk_len`` steps whose transitions are
    uniform over the neighbor list.

    Determinism: the step-t choice for walk (start, walk_no) is
    ``portable_hash64(seed|start|walk_no|t) % degree(current)`` against
    the dst-sorted neighbor index — a pure function of the edge set and
    the seed (same md5 chain as ``negatives.node_index``), so walks are
    reproducible across runs/partitionings AND replayable in DuckDB.

    Scale shape (the pagerank trio again): the indexed neighbor table
    ``(node, idx, nxt, deg)`` is partitioned ONCE and localCheckpointed;
    each of the ``walk_len`` rounds shuffles only the walk frontier
    (N x walks_per_node narrow rows) into two hash joins — a broadcast-
    size degree lookup and the (node, idx) neighbor probe. Walk state
    is checkpointed per round so lineage stays flat.
    """
    from ..functions.text import portable_hash64

    es = edges_sym.select("src", "dst").distinct().localCheckpoint()
    w_nbr = Window.partitionBy("src").orderBy("dst")
    nbr = (
        es.withColumn("idx", (F.row_number().over(w_nbr) - 1).cast("long"))
        .select(F.col("src").alias("node"), "idx", F.col("dst").alias("nxt"))
        .repartition("node")
        .localCheckpoint()
    )
    deg = nbr.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    walks = (
        nbr.select("node")
        .distinct()
        .select(
            F.col("node").alias("start"),
            F.explode(
                F.sequence(F.lit(0), F.lit(walks_per_node - 1))
            ).alias("walk_no"),
        )
    )
    cur = walks.select("start", "walk_no", F.col("start").alias("node"))
    out = cur.select("start", "walk_no", F.lit(0).alias("step"), "node")
    for t in range(1, walk_len + 1):
        h = portable_hash64(
            F.concat_ws(
                "|",
                F.lit(seed),
                F.col("start").cast("string"),
                F.col("walk_no").cast("string"),
                F.lit(str(t)),
            )
        )
        stepped = (
            cur.join(deg, "node")
            .withColumn("idx", F.pmod(h, F.col("deg")))
            .join(nbr, ["node", "idx"])
            .select("start", "walk_no", F.col("nxt").alias("node"))
            .localCheckpoint(eager=False)
        )
        out = out.unionAll(
            stepped.select("start", "walk_no", F.lit(t).alias("step"), "node")
        )
        cur = stepped
    return out


def kcore(
    edges: DataFrame,
    k: int,
    rounds: int,
    materialize: bool = True,
) -> DataFrame:
    """Bounded-round k-core peeling over a canonical (src<dst) edge
    list: ``rounds`` rounds of "drop every node with degree < k, keep
    only edges between survivors", returning the surviving nodes with
    their degree INSIDE the surviving subgraph — ``(node, degree)``.

    Equal to the true k-core (the maximal subgraph of minimum degree
    >= k — the standard dense-community filter before clustering a
    noisy co-occurrence KG) whenever ``rounds`` >= the peeling depth;
    same bounded-iteration contract as :func:`sssp` — the caller
    asserts convergence by checking one extra round changes nothing.

    Scale shape: each round is one degree aggregation (narrow,
    partial-aggregable) + two semi-join-shaped hash joins of the edge
    list against the survivor node set; the edge list shrinks
    monotonically and is localCheckpointed per round so lineage stays
    flat. Nothing ever leaves (node-id, count) width.
    """
    e = edges.select("src", "dst").distinct()
    if materialize:
        e = e.localCheckpoint()
    for _ in range(rounds):
        keep = degrees(e).where(F.col("degree") >= k).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "src"), "src")
            .join(keep.withColumnRenamed("node", "dst"), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
    return degrees(e)


# ---------------------------------------------------------------------------
# strongly connected components (directed)
# ---------------------------------------------------------------------------
def _tarjan_min_scc(edge_list) -> dict:
    """Iterative Tarjan over a driver-local edge list -> {node: min node
    id of its SCC}. Used only on the post-trim cyclic core when it fits
    the ``small_core_edges`` bound; textbook algorithm (Tarjan 1972)."""
    adj: dict = {}
    nodes = set()
    for a, b in edge_list:
        adj.setdefault(a, []).append(b)
        nodes.add(a)
        nodes.add(b)
    index: dict = {}
    low: dict = {}
    onstack: set = set()
    stack: list = []
    out: dict = {}
    counter = 0
    for root in nodes:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                onstack.add(v)
            descended = False
            nbrs = adj.get(v, ())
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    descended = True
                    break
                if w in onstack:
                    if index[w] < low[v]:
                        low[v] = index[w]
            if descended:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    onstack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                if low[v] < low[u]:
                    low[u] = low[v]
    return out


def strongly_connected_components(
    edges: DataFrame,
    max_peel_rounds: int = 16,
    max_prop_rounds: int = 64,
    small_core_edges: int = 200_000,
) -> DataFrame:
    """EXACT strongly connected components of a DIRECTED edge list
    ``(src, dst)`` -> ``(node, scc_id)`` with ``scc_id`` = min node id
    of the component. The directed twin of ``components.
    connected_components`` — cycles of is_a/part_of/cites edges are how
    contradictory KG assertions manifest, and collapsing each cycle
    cluster to one canonical node (condensation) is the standard cure.

    Algorithm: forward-backward COLORING with peeling (Orzan 2004; the
    FW-BW-coloring scheme of Slota/Rajamanickam/Madduri 2014, chosen
    over Tarjan — inherently sequential stack DFS — for shuffle-round
    parallelism):

      round: (0) TRIM — iteratively drop nodes lacking in- or
      out-edges (singleton SCCs by definition); sparse graphs lose
      most nodes here and the expensive phases see only the cyclic
      core; (1) forward min-label propagation to fixpoint, with a
      pointer-doubling shortcut per step (color(v) <- color(color(v)))
      so a diameter-D class converges in O(log D) joins, not O(D);
      (2) every color class's root r (color(r) = r) backward-BFSes
      WITHIN its class; nodes reached are exactly SCC(r) — color(u)=r
      proves r->u, in-class backward reachability proves u->r;
      (3) extracted nodes leave the graph; repeat on the remainder.
      Every class root is extracted each round, so rounds <= the
      longest root-chain; ``max_peel_rounds`` is an operational bound
      (RuntimeError on overrun — semantics are exact, never truncated
      silently).

    Scale shape: every shuffle carries (node-id, color) pairs — two
    longs; the edge list is localCheckpointed once per peel round and
    only SHRINKS; convergence checks are counts over the narrow color
    table. The distributed TRIM runs first at any scale; if the cyclic
    core it leaves fits ``small_core_edges`` (the
    ``components.connected_components`` adaptive discipline — real KG
    cycle cores are orders smaller than the graph), the core is solved
    on the driver with iterative Tarjan in one collect of bounded size;
    the FW-BW peeling below is the path for oversized cores (force it
    with ``small_core_edges=0`` — how the pytest suite pins it against
    the Tarjan reference). Either path emits identical rows.
    """

    def _trim_once(g):
        # an edge (s, d) survives iff s has an in-edge (s ∈ dst-set)
        # and d has an out-edge (d ∈ src-set) — the "both endpoints in
        # src∩dst" condition without materializing the intersect: s is
        # a src and d is a dst by construction, so two semi-joins cover
        # all four degree conditions
        return (
            g.join(g.select(F.col("dst").alias("src")).distinct(),
                   "src", "left_semi")
            .join(g.select(F.col("src").alias("dst")).distinct(),
                  "dst", "left_semi")
            .select("src", "dst")
        )

    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    e = e.localCheckpoint()
    all_nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    out: DataFrame | None = None
    n_edges = e.count()
    # (0) TRIM to fixpoint: a node with no in-edges (or no out-edges)
    # is a singleton SCC; dropping them cascades down dangling chains.
    # On sparse graphs this removes the vast majority of nodes before
    # any coloring happens (sf0.01 part-sequence graph: 1817 -> 240
    # nodes), so whichever core solver runs sees only the cyclic core.
    # Trimmed nodes are assigned scc_id = self at the very end. TWO
    # trim passes per convergence count: each pass peels one level of
    # a dangling chain, and the count is the latency-bound driver
    # action, so batching halves the round trips.
    while n_edges:
        e2 = _trim_once(_trim_once(e)).localCheckpoint(eager=False)
        n2 = e2.count()
        e, converged = e2, n2 == n_edges
        n_edges = n2
        if converged:
            break
    if n_edges and n_edges <= small_core_edges:
        # bounded collect (<= small_core_edges two-long rows): solve
        # the core exactly on the driver, exactly like the small-graph
        # escape in connected_components
        assign = _tarjan_min_scc(
            [(r[0], r[1]) for r in e.select("src", "dst").collect()]
        )
        spark = edges.sparkSession
        node_t = e.schema["src"].dataType.simpleString()
        out = spark.createDataFrame(
            list(assign.items()), f"node {node_t}, scc_id {node_t}"
        )
        singles = all_nodes.join(out.select("node"), "node", "left_anti")
        return out.unionByName(
            singles.select("node", F.col("node").alias("scc_id"))
        )
    for _ in range(max_peel_rounds):
        # re-TRIM to fixpoint at the top of every peel round (the
        # first round's trim converges immediately: the graph arrives
        # pre-trimmed from above)
        while n_edges:
            e2 = _trim_once(e).localCheckpoint(eager=False)
            n2 = e2.count()
            e, converged = e2, n2 == n_edges
            n_edges = n2
            if converged:
                break
        if not n_edges:
            break
        remaining = (
            e.select(F.col("src").alias("node"))
            .unionAll(e.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint()
        )
        # (1) forward min-label propagation with pointer doubling
        colors = remaining.select("node", F.col("node").alias("color")).localCheckpoint()

        def _prop_step(c):
            relax = (
                e.join(c.withColumnsRenamed({"node": "src", "color": "cand"}), "src")
                .select(F.col("dst").alias("node"), "cand")
            )
            stepped = (
                c.unionByName(relax.withColumnRenamed("cand", "color"))
                .groupBy("node")
                .agg(F.min("color").alias("color"))
            )
            # shortcut: my color's color also reaches me (min-labels
            # compose transitively), halving remaining propagation depth
            return stepped.join(
                stepped.select(
                    F.col("node").alias("color"), F.col("color").alias("c2")
                ),
                "color",
            ).select("node", F.least("color", "c2").alias("color"))

        for _ in range(max_prop_rounds):
            # two relax+shortcut steps per convergence check: the check
            # is a driver action, and round-trip latency dominates on
            # the (tiny after trim) cyclic core
            shortcut = _prop_step(_prop_step(colors)).localCheckpoint(eager=False)
            unchanged = (
                shortcut.join(colors.withColumnRenamed("color", "old"), "node")
                .where(F.col("color") != F.col("old"))
                .isEmpty()
            )
            colors = shortcut
            if unchanged:
                break
        else:
            raise RuntimeError(
                f"scc: forward coloring did not converge in {max_prop_rounds} rounds"
            )
        # (2) backward reachability to each class root, within the class
        marked = colors.where(F.col("node") == F.col("color")).localCheckpoint()
        n_marked = marked.count()

        def _back_step(m):
            preds = (
                e.join(m.withColumnsRenamed({"node": "dst", "color": "scc"}), "dst")
                .select(F.col("src").alias("node"), F.col("scc").alias("color"))
                # in-class only: the predecessor must carry the same color
                .join(colors, ["node", "color"])
            )
            return m.unionByName(preds).distinct()

        for _ in range(max_prop_rounds):
            grown = _back_step(_back_step(marked)).localCheckpoint(eager=False)
            n2 = grown.count()
            marked, done = grown, n2 == n_marked
            n_marked = n2
            if done:
                break
        else:
            raise RuntimeError(
                f"scc: backward sweep did not converge in {max_prop_rounds} rounds"
            )
        scc_rows = marked.withColumnRenamed("color", "scc_id")
        out = scc_rows if out is None else out.unionByName(scc_rows).localCheckpoint()
        keep = remaining.join(marked.select("node"), "node", "left_anti")
        e = (
            e.join(keep.withColumnRenamed("node", "src"), "src")
            .join(keep.withColumnRenamed("node", "dst"), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        n_edges = e.count()
    else:
        if n_edges:
            raise RuntimeError(
                f"scc: peeling did not finish in {max_peel_rounds} rounds"
            )
    # every node never extracted by a FW-BW round was trimmed away (or
    # the input had no cycles at all): each is its own SCC
    if out is None:
        return all_nodes.select("node", F.col("node").alias("scc_id"))
    singles = all_nodes.join(out.select("node"), "node", "left_anti")
    return out.unionByName(
        singles.select("node", F.col("node").alias("scc_id"))
    )


# ---------------------------------------------------------------------------
# Neighborhood function (ANF / HyperBall)
# ---------------------------------------------------------------------------
def neighborhood_function(
    edges_sym: DataFrame, h: int, exact_max_nodes: int = 1_000_000
) -> DataFrame:
    """Per-node neighborhood function (Palmer et al. KDD'02 ANF; Boldi
    & Vigna's HyperBall): ``(node, h, reach)`` where ``reach`` =
    |B(node, r)|, the number of nodes within distance r, for r = 0..h,
    computed for ALL nodes simultaneously over a SYMMETRIC edge list —
    the primitive behind effective-diameter and centrality-by-reach
    queries that per-seed BFS cannot answer at n-node scale.

    Exact mode over a dense node index (``encoding.dictionary_encode``
    — no global window): every node's reachability set is a bitmap,
    stored SPARSELY as (node, word, bits) rows — only nonzero words
    exist, so round r costs O(frontier mass), not O(n^2/64), until the
    balls saturate. Per round, each node ORs its neighbors' bitmaps in:

      * msgs = edges ⋈ state on src — edges are materialized once and
        never shuffle (the pagerank discipline); only word-rows ride;
      * ONE partial-aggregable ``bit_or`` groupBy on (node, word) —
        hub-safe because the key includes the word index — IS the new
        state; no array reassembly, no second shuffle;
      * per-round localCheckpoint keeps the iterative lineage flat.

    Counts are exact integers (sum of bit_count per node), so the
    DuckDB recursive-closure twin hashes identically — no float wobble.

    SCALE NOTE: the exact representation is Θ(reachable-set/64) words
    per node — right for validation corpora and as the oracle surface.
    At 10^9+ nodes you swap the word-rows for constant-size
    Flajolet-Martin/HLL registers and keep THIS exact dataflow (that
    swap IS HyperBall); the operator refuses loudly past
    ``exact_max_nodes`` instead of OOMing an executor mid-round.
    """
    if h < 0:
        raise ValueError("h must be >= 0")
    from .encoding import dictionary_encode

    idx = dictionary_encode(edges_sym.select("src"), "src").select(
        F.col("value").alias("orig"), F.col("id").alias("node")
    )
    n = idx.count()  # bounded: metadata-size scalar, gates the mode
    if n == 0:
        return edges_sym.sparkSession.createDataFrame(
            [], "node long, h int, reach long"
        )
    if n > exact_max_nodes:
        raise ValueError(
            f"exact bitmap mode caps at {exact_max_nodes} nodes (got {n}); "
            "swap in sketch registers for larger graphs"
        )
    idx = F.broadcast(idx.localCheckpoint())
    e = (
        edges_sym.join(idx, edges_sym.src == idx.orig)
        .select(F.col("node").alias("s"), F.col("dst").alias("_d"))
        .join(idx, F.col("_d") == idx.orig)
        .select("s", F.col("node").alias("d"))
        .localCheckpoint()
    )
    # sparse state: one (node, w, bits) row per NONZERO bitmap word
    state = idx.select(
        "node",
        (F.col("node") / 64).cast("int").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(node % 64 AS INT))").alias(
            "bits"
        ),
    ).localCheckpoint()

    def _reach(st: DataFrame, r: int) -> DataFrame:
        return st.groupBy("node").agg(
            F.lit(r).cast("int").alias("h"),
            F.sum(F.bit_count("bits").cast("long")).alias("reach"),
        )

    out = _reach(state, 0)
    for r in range(1, h + 1):
        msgs = e.join(state, e.s == state.node).select(
            F.col("d").alias("node"), "w", "bits"
        )
        state = (
            state.unionByName(msgs)
            .groupBy("node", "w")
            .agg(F.bit_or("bits").alias("bits"))
            .localCheckpoint()
        )
        out = out.unionByName(_reach(state, r))
    return (
        out.join(idx, "node")
        .select(F.col("orig").alias("node"), "h", "reach")
    )


def harmonic_centrality(
    edges_sym: DataFrame, h: int, exact_max_nodes: int = 1_000_000
) -> DataFrame:
    """Truncated harmonic centrality: C_h(v) = sum over u within
    distance h of 1/d(u,v) — the centrality-by-reach ranking (Boldi &
    Vigna's preferred centrality, computed by the same HyperBall pass).
    Derived entirely from :func:`neighborhood_function`'s cumulative
    reaches: the r-th ball growth (reach_r - reach_{r-1}) counts the
    nodes at EXACTLY distance r, each contributing 1/r.

    Same scale contract as neighborhood_function (one extra narrow
    window + aggregate over the n x (h+1) reach rows). With small h the
    per-node sum has h terms of integer/r, so the DuckDB twin (grouped
    count(md)/md in the same r order) reproduces it exactly.
    """
    if h < 1:
        raise ValueError("h must be >= 1")
    nf = neighborhood_function(edges_sym, h, exact_max_nodes)
    w = Window.partitionBy("node").orderBy("h")
    delta = F.col("reach") - F.lag("reach", 1).over(w)
    per_r = nf.withColumn("_d", delta).where(F.col("h") >= 1)
    return (
        per_r.groupBy("node")
        .agg(
            F.round(
                F.sum(F.col("_d").cast("double") / F.col("h").cast("double")),
                6,
            ).alias("harmonic")
        )
    )


# ---------------------------------------------------------------------------
# semi-supervised entity-type inference
# ---------------------------------------------------------------------------
def type_inference(
    edges_sym: DataFrame, seeds: DataFrame, iters: int = 2
) -> DataFrame:
    """Semi-supervised entity-type inference over the KG: a small set of
    SEED nodes carries a known type (``(node, etype)``); every other
    node adopts, per round, the plurality type among its typed
    neighbors (ties broken to the lexicographically smallest type so
    the result is deterministic and oracle-able). Seed labels are
    CLAMPED — they vote every round but never change — which is what
    separates this from :func:`label_propagation` (no seeds, labels
    drift freely) and makes it the classic label-spreading /
    Zhu-Ghahramani (ICML'03) shape used to type untyped KG entities
    from a typed ontology core.

    Returns ``(node, etype, is_seed)`` — only nodes typed within
    ``iters`` hops of a seed appear; nodes the type wave never reached
    are absent (their type is genuinely unknown).

    Scale shape: identical discipline to :func:`pagerank` /
    :func:`label_propagation` — the edge table is hash-partitioned on
    the join key ONCE and persisted; every round shuffles only the
    typed vector (node, etype: two narrow columns) plus the per-(node,
    type) vote counts, and the vector is localCheckpoint-ed so the
    iterative lineage stays flat. The plurality argmax is one
    ``min(struct(-count, etype))`` — no window, no second shuffle.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = edges_sym.select("src", "dst").repartition("dst").localCheckpoint()
    sd = seeds.select("node", "etype").localCheckpoint()
    typed = sd
    for _ in range(iters):
        votes = (
            e.join(
                typed.select(F.col("node").alias("dst"), "etype"), "dst"
            )
            .groupBy("src", "etype")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        winner = (
            votes.groupBy("src")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"), F.col("etype"))
                ).alias("m")
            )
            .select(F.col("src").alias("node"), F.col("m.etype").alias("etype"))
        )
        inferred = winner.join(sd.select("node"), "node", "left_anti")
        typed = sd.unionByName(inferred).localCheckpoint(eager=False)
    return (
        typed.join(
            sd.select("node", F.lit(True).alias("is_seed")), "node", "left"
        )
        .select(
            "node", "etype", F.coalesce("is_seed", F.lit(False)).alias("is_seed")
        )
    )


# ---------------------------------------------------------------------------
# community quality: Newman modularity
# ---------------------------------------------------------------------------
def modularity(edges: DataFrame, communities: DataFrame) -> DataFrame:
    """Newman modularity of a community assignment over a canonical
    (src<dst, no self-loop) undirected edge list — THE quality score
    for :func:`label_propagation` / :func:`connected_components`
    partitions (Newman & Girvan, Phys. Rev. E 69, 2004), in its
    per-community-sum form:

        Q = sum_c [ L_c / m  -  (D_c / (2m))^2 ]

    where ``L_c`` = intra-community edge count, ``D_c`` = total degree
    of the community's nodes, ``m`` = total edges. Returns one row per
    community ``(label, n_nodes, intra_edges, degree_sum,
    contribution)`` — ``sum(contribution)`` IS Q, and the per-community
    rows are the drill-down (which communities are dense vs accidental).

    Every node in ``edges`` must appear in ``communities`` (LPA/CC
    output satisfies this by construction); a missing node raises
    rather than silently skewing degree sums.

    Scale shape: two narrow hash joins of the edge list against the
    (node, label) vector — the same key the graph ops already shuffle
    on — then partial-aggregable per-label sums; m rides in as a
    1-row broadcast (crossJoin of an aggregate, the bm25 stats shape).
    Doubles only in the final two-term formula, round(6)-stable.
    """
    lab = communities.select("node", "label")
    deg = degrees(edges)
    missing = deg.join(lab, "node", "left_anti")
    if missing.take(1):
        raise ValueError("communities must label every node in edges")
    m_df = edges.select(F.count(F.lit(1)).cast("double").alias("m"))
    intra = (
        edges.join(lab.select(F.col("node").alias("src"),
                              F.col("label").alias("_ls")), "src")
        .join(lab.select(F.col("node").alias("dst"),
                         F.col("label").alias("_ld")), "dst")
        .where(F.col("_ls") == F.col("_ld"))
        .groupBy(F.col("_ls").alias("label"))
        .agg(F.count(F.lit(1)).alias("intra_edges"))
    )
    dsum = (
        deg.join(lab, "node")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("degree").alias("degree_sum"),
        )
    )
    return (
        dsum.join(intra, "label", "left")
        .crossJoin(F.broadcast(m_df))
        .select(
            "label", "n_nodes",
            F.coalesce("intra_edges", F.lit(0)).cast("long").alias("intra_edges"),
            F.col("degree_sum").cast("long").alias("degree_sum"),
            # (d/(2m)) squared via plain multiply, not pow(): division
            # and multiplication are correctly-rounded IEEE in both
            # engines, libm pow is not
            F.round(
                F.coalesce("intra_edges", F.lit(0)).cast("double") / F.col("m")
                - (
                    F.col("degree_sum").cast("double")
                    / (F.lit(2.0) * F.col("m"))
                )
                * (
                    F.col("degree_sum").cast("double")
                    / (F.lit(2.0) * F.col("m"))
                ),
                6,
            ).alias("contribution"),
        )
    )


def hits(edges: DataFrame, iters: int = 2) -> DataFrame:
    """HITS hubs/authorities (Kleinberg, JACM 1999) over a DIRECTED
    edge list: ``(node, hub, authority)``.

    Numerics: the mutual-reinforcement iteration (a_k from h_{k-1},
    then h_k from a_k — Kleinberg's update order) runs UNNORMALIZED in
    exact decimal(38,0) integers from h_0 = 1, and scores are scaled
    once at the end by the max (the [0,1] max-norm variant). Every
    intermediate is therefore exactly representable and order-
    independent — a float L2 norm per round would make the result
    depend on Spark's partial-aggregation order and break the
    cross-engine hash contract (same trick as ``grouped_ols``'s exact
    sufficient statistics). Magnitudes grow like sum(deg^{2k}); with
    decimal(38,0) the iteration is safe to ~10^38, far past any graph
    whose degree sums fit a shuffle.

    Scale shape: the edge table is deduped + localCheckpointed ONCE;
    each half-step shuffles only the (node, score) vector, never the
    edges; per-round localCheckpoint keeps the iterative lineage flat
    (the pagerank contract). Nodes with no in-edges hold authority 0,
    no out-edges hub 0 — kept explicitly via the node-universe left
    join so the output always covers every node.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = edges.select("src", "dst").distinct().localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # node scores stay SPARSE during iteration: a node missing from a
    # vector holds 0 and contributes nothing through the inner join, so
    # the per-half-step nodes left-join (2 joins/iteration) is deferred
    # to the single final projection. Only h is checkpointed per round
    # (a feeds h immediately); edges stay put, the score vectors ride
    # the joins — the pagerank shuffle contract.
    h = nodes.select("node", F.lit(1).cast("decimal(38,0)").alias("s"))
    a = None
    for _ in range(iters):
        a = (
            e.join(h.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("s").alias("s"))
        )
        h = (
            e.join(a.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("s").alias("s"))
        ).localCheckpoint()
    mx = h.agg(F.max("s").alias("mh")).crossJoin(a.agg(F.max("s").alias("ma")))
    zero = F.lit(0).cast("decimal(38,0)")
    joined = (
        nodes.join(h.withColumnRenamed("s", "hs"), "node", "left")
        .join(a.withColumnRenamed("s", "as_"), "node", "left")
        .select(
            "node",
            F.coalesce("hs", zero).alias("hs"),
            F.coalesce("as_", zero).alias("as_"),
        )
        .crossJoin(F.broadcast(mx))
    )
    norm = lambda v, m: F.when(  # noqa: E731
        F.col(m) > 0,
        F.round(F.col(v).cast("double") / F.col(m).cast("double"), 6),
    ).otherwise(F.lit(0.0))
    return joined.select(
        "node", norm("hs", "mh").alias("hub"), norm("as_", "ma").alias("authority")
    )


def labeled_paths(
    triples: DataFrame,
    start_nodes: DataFrame,
    max_hops: int = 3,
    s_col: str = "subj",
    p_col: str = "pred",
    o_col: str = "obj",
) -> DataFrame:
    """Enumerate labeled simple paths from ``start_nodes`` (one ``node``
    column) through the directed triple graph: ``(start, end_node,
    hops, path)`` for every 1..max_hops-step walk that never revisits a
    node; ``path`` is the '/'-joined predicate sequence (e.g.
    ``placed_by/in_nation``). The KG query behind "how are these two
    entities related": khop answers WHETHER within k, this answers HOW,
    with the relation chain as a first-class value (meta-paths — the
    unit of path-ranking features and of rule-mining evidence).

    Scale shape: frontier-at-a-time like khop — each hop is ONE join of
    the current frontier against the edge table (checkpointed once);
    the frontier carries (start, end, path-string, visited-array) and
    edges never re-derive. Simple-path pruning (the visited array)
    bounds depth blow-up on cycles, but fan-out is inherently
    prod(out-degree) along the chain: choose start sets / max_hops the
    way :func:`cooccurrence_edges` chooses caps — this operator is for
    dimension-sized start sets (an entity page, a cohort), not
    all-pairs. Duplicate (start, end, path) rows are REAL distinct
    evidence (different intermediate entities) and are preserved.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    t = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    ).distinct().localCheckpoint()
    frontier = start_nodes.select(
        F.col("node").alias("start"),
        F.col("node").alias("end_node"),
        F.lit("").alias("path"),
        F.array(F.col("node")).alias("visited"),
    )
    outs = []
    for hop in range(1, max_hops + 1):
        stepped = (
            frontier.join(t, frontier.end_node == t.s)
            .where(~F.array_contains(F.col("visited"), F.col("o")))
            .select(
                "start",
                F.col("o").alias("end_node"),
                F.when(F.col("path") == "", F.col("p"))
                .otherwise(F.concat_ws("/", "path", "p"))
                .alias("path"),
                F.concat("visited", F.array(F.col("o"))).alias("visited"),
            )
        )
        frontier = stepped.localCheckpoint() if hop < max_hops else stepped
        outs.append(
            frontier.select(
                "start", "end_node", F.lit(hop).alias("hops"), "path"
            )
        )
    out = outs[0]
    for o_ in outs[1:]:
        out = out.unionAll(o_)
    return out


def walk_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """Skip-gram training pairs from :func:`random_walks` output:
    ``(center, context, n_pairs)`` for every ordered co-occurrence
    within ``window`` steps inside one walk — the materialization
    DeepWalk/node2vec feeds to the embedding trainer (word2vec over
    walk "sentences"); multiplicity aggregates so the trainer weights
    by pair frequency instead of re-reading duplicates.

    Scale shape: one equi-join keyed by the walk id (fan bounded by
    walk_len x 2window, a constant), then one partial-aggregable count
    shuffle carrying only node-id pairs. Both inputs are the walk table
    — N x walks_per_node x (walk_len+1) narrow rows — never the edge
    table.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    a = walks.select(
        "start", "walk_no", F.col("step").alias("sa"),
        F.col("node").alias("center"),
    )
    b = walks.select(
        "start", "walk_no", F.col("step").alias("sb"),
        F.col("node").alias("context"),
    )
    j = a.join(b, ["start", "walk_no"]).where(
        (F.abs(F.col("sb") - F.col("sa")) <= window)
        & (F.col("sa") != F.col("sb"))
    )
    return j.groupBy("center", "context").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
