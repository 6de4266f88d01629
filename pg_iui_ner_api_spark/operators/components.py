"""Connected components via alternating large-star/small-star (SURVEY.md M6).

Implements the MapReduce CC algorithm of Kiveris et al., "Connected
Components in MapReduce and Beyond" (SOCC'14), on DataFrames:

  large-star(u): for every neighbor v > u, emit (v, m(u))
  small-star(u): for every neighbor v <= u, emit (v, m(u)), plus (u, m(u))
  where m(u) = min(Γ(u) ∪ {u})

Alternating the two converges in O(log n) rounds to a forest of depth 1
(every node points at its component minimum). Each round is one
groupBy-min + one join — all JVM-side; lineage is cut every round with
``localCheckpoint`` so the plan doesn't grow (the classic iterative-
algorithm OOM on big graphs), and convergence is detected by an edge-set
checksum (count + sum of xxhash64), not a collect of the edges.

Skew: hub components (a celebrity entity with 10^9 mentions) concentrate
on the hub's min node. The star-edge *construction* in
``canonical_components`` already avoids quadratic blowup (each mention
connects only to its group minimum, never pairwise), and AQE skew-join
splitting handles the remaining reduce-side skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _edge_checksum(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _large_star(e: DataFrame) -> DataFrame:
    """e: undirected edges as one row per (u,v) with u!=v (not symmetrized)."""
    nbrs = e.select("u", "v").union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        nbrs.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges (u,v) with u>v, then hang all small neighbors off m(u)."""
    directed = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    hang = (
        directed.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edge = mins.select(F.col("u"), F.col("m").alias("v"))
    return hang.union(self_edge).where(F.col("u") != F.col("v")).distinct()


SMALL_GRAPH_EDGES = 2_000_000  # driver union-find below this edge count


def _driver_cc(spark, rows) -> DataFrame:
    """Union-find on the driver for small graphs — one pass, zero jobs.

    The distributed loop costs ~10 Spark jobs per iteration (stars +
    checksum); below SMALL_GRAPH_EDGES the whole graph fits trivially in
    driver memory and the answer is a LocalRelation. The canonicalization
    block graph (entity↔surface) is vocabulary-sized, so production runs
    take this path too unless the dictionary is enormous.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        u, v = r["u"], r["v"]
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by min id so component = min node id (loop invariant)
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    nodes = set(parent)
    for r in rows:
        nodes.add(r["u"])
        nodes.add(r["v"])
    data = [(n, find(n)) for n in sorted(nodes)]
    from ..synth import local_dim_df

    if not data:
        return spark.sql("SELECT CAST(NULL AS BIGINT) node, CAST(NULL AS BIGINT) component WHERE FALSE")
    return local_dim_df(spark, data, ["node", "component"]).select(
        F.col("node").cast("long").alias("node"),
        F.col("component").cast("long").alias("component"),
    )


def connected_components(edges: DataFrame, max_iter: int = 25,
                         small_graph_edges: int = SMALL_GRAPH_EDGES) -> DataFrame:
    """edges(u: long, v: long) -> (node: long, component: long).

    component = min node id reachable from `node`. Nodes appearing only
    as isolated self-loops should not be passed; callers union isolated
    nodes back with component = self.

    Adaptive physical strategy: count the deduped edge set once — small
    graphs solve on the driver (LocalRelation result, no iteration);
    large graphs run the alternating-star loop. Pass
    ``small_graph_edges=0`` to force the distributed loop (tests do).
    """
    e = edges.select("u", "v").where(F.col("u") != F.col("v")).distinct().localCheckpoint()
    n_edges = e.count()
    if n_edges <= small_graph_edges:
        return _driver_cc(e.sparkSession, e.collect())
    prev = _edge_checksum(e)
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint()
        cur = _edge_checksum(e)
        if cur == prev:
            break
        prev = cur
    # converged: every edge is (node, root) with root < node
    comp = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return comp.union(roots).groupBy("node").agg(F.min("component").alias("component"))


def incremental_components(assign: DataFrame, new_edges: DataFrame,
                           max_iter: int = 25,
                           small_graph_edges: int = SMALL_GRAPH_EDGES,
                           ) -> DataFrame:
    """Fold an edge DELTA into an existing ``(node, component)``
    assignment without recomputing over the historical edge set — the
    maintenance primitive for a KG whose entity graph grows by daily
    increments at 10^12-document scale (recomputing CC over all
    history per increment is the thing this avoids).

    Two facts make it exact:

    * the assignment is itself a star-compressed, CC-equivalent summary
      of every historical edge — its rows ARE edges (node -> root), so
      ``CC(assign-as-edges ∪ delta) == CC(history ∪ delta)``;
    * only components INCIDENT to the delta can change: rows of
      untouched components pass through verbatim, and CC runs on the
      touched star rows + delta only.

    Cost is proportional to |delta| + |touched components|, never
    |history|: one semi-join restricts the assignment to touched
    components, one anti-join emits the untouched remainder unchanged,
    and the solver (the same adaptive ``connected_components``) sees a
    subgraph whose edge count is touched-members + delta. Component ids
    stay min-node-id, so a delta that links a smaller id re-labels the
    merged component exactly as a full recompute would.
    """
    delta = (
        new_edges.select("u", "v").where(F.col("u") != F.col("v"))
        .distinct().localCheckpoint()
    )
    touched_nodes = (
        delta.select(F.col("u").alias("node"))
        .unionAll(delta.select(F.col("v").alias("node")))
        .distinct()
    )
    touched_comps = (
        assign.join(touched_nodes, "node", "left_semi")
        .select("component").distinct().localCheckpoint()
    )
    star = assign.join(touched_comps, "component", "left_semi")
    sub_edges = star.select(
        F.col("node").alias("u"), F.col("component").alias("v")
    ).unionByName(delta)
    sub = connected_components(sub_edges, max_iter, small_graph_edges)
    untouched = assign.join(touched_comps, "component", "left_anti")
    return untouched.unionByName(sub.select("node", "component"))


def canonical_components(linked_mentions: DataFrame) -> DataFrame:
    """Mention-level canonicalization -> component per mention.

    Two mentions co-refer iff they are connected through shared linked
    entity_ids and/or shared normalized surfaces. That relation factors
    through the **bipartite entity↔surface block graph**: mention m
    (entity e, surface s) connects e—s; components of mentions =
    components of their entity nodes in that graph. So the corpus-sized
    mention table contributes ONE distinct projection (entity_id,
    surface) — at 10^12 documents this is bounded by |vocabulary| ×
    |entities|, not by corpus size — and the iterative CC runs on a
    dimension-sized graph. A hub entity with 10^9 mentions is exactly
    one node here; skew never reaches the loop.

    Returns (mention_id, node, component, entity_id) with node/component
    being stable 64-bit hashes of entity ids.
    """
    m = linked_mentions.select(
        "mention_id", "entity_id", F.lower("word").alias("surface")
    )
    # bipartite edges over hashed ids; surface ids salted into a disjoint
    # id space from entity ids via a tag prefix
    pairs = m.select("entity_id", "surface").distinct().localCheckpoint()
    edges = pairs.select(
        F.xxhash64(F.concat(F.lit("e:"), "entity_id")).alias("u"),
        F.xxhash64(F.concat(F.lit("s:"), "surface")).alias("v"),
    )
    cc = connected_components(edges)
    ent_comp = (
        pairs.select("entity_id")
        .distinct()
        .withColumn("node", F.xxhash64(F.concat(F.lit("e:"), "entity_id")))
        .join(cc, "node", "left")
        .select(
            "entity_id",
            "node",
            F.coalesce("component", "node").alias("component"),
        )
    )
    return m.select("mention_id", "entity_id").join(
        F.broadcast(ent_comp), "entity_id"
    ).select("mention_id", "node", "component", "entity_id")


def _modal(joined: DataFrame, col: str, alias: str) -> DataFrame:
    """Per-component modal value of ``col`` with a DETERMINISTIC
    tie-break: ``min(struct(-count, value))`` — the largest count wins,
    ties go to the lexicographically smallest value. ``F.mode()`` breaks
    ties by partition order, which made the canonicalization outputs
    partitioning-dependent (r4 ADVICE); this is the same tie-break
    :func:`fusion.entity_report` uses, so every vote in the repo agrees."""
    counts = joined.groupBy("component", col).agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy("component").agg(
        F.min(F.struct((-F.col("c")).alias("nc"), F.col(col)))
        .getField(col)
        .alias(alias)
    )


def _component_entity_vote(
    linked_mentions: DataFrame, components: DataFrame
) -> DataFrame:
    """Per-component representative entity ``(component, canonical_id,
    n_mentions)`` — the single shared vote that BOTH
    :func:`canonical_nodes` and :func:`entity_canonical_map` derive
    from, so the node table and the edge-rewrite map agree by
    construction even on tied components."""
    lm = linked_mentions.select("mention_id", "entity_id")
    joined = components.select("mention_id", "component").join(lm, "mention_id")
    counts = joined.groupBy("component", "entity_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    return counts.groupBy("component").agg(
        F.min(F.struct((-F.col("c")).alias("nc"), F.col("entity_id")))
        .getField("entity_id")
        .alias("canonical_id"),
        F.sum("c").alias("n_mentions"),
    )


def canonical_nodes(linked_mentions: DataFrame, components: DataFrame) -> DataFrame:
    """KG node table: one row per canonical entity cluster.

    Representative entity = modal linked entity of the component;
    canonical_name = modal canonical_name (A5 'canonical name vote').
    All votes tie-break deterministically via ``min(struct(-count,
    value))``; when several components share a representative entity,
    the name/kind of the LARGEST component wins (ties again
    lexicographic), so the output hash is stable across partitionings.
    """
    lm = linked_mentions.select("mention_id", "entity_id", "canonical_name", "link_kind")
    joined = components.select("mention_id", "component").join(lm, "mention_id")
    per_component = (
        _component_entity_vote(linked_mentions, components)
        .join(_modal(joined, "canonical_name", "canonical_name"), "component")
        .join(_modal(joined, "link_kind", "kind"), "component")
    )
    return (
        per_component.groupBy(F.col("canonical_id").alias("entity_id"))
        .agg(
            F.min(
                F.struct(
                    (-F.col("n_mentions")).alias("nm"),
                    F.col("canonical_name"),
                    F.col("kind"),
                )
            ).alias("_w"),
            F.sum("n_mentions").alias("n_mentions"),
        )
        .select(
            "entity_id",
            F.col("_w.canonical_name").alias("canonical_name"),
            F.col("_w.kind").alias("kind"),
            "n_mentions",
        )
    )


def entity_vote_counts(linked_mentions: DataFrame) -> DataFrame:
    """``(entity_id, canonical_name, link_kind, cnt)`` — the ADDITIVE
    sufficient statistics of every canonical-node vote. Counting
    mentions per (entity, name, kind) once lets a maintenance pass fold
    a mention DELTA into accumulated counts with one dimension-sized
    aggregation instead of re-reading the corpus: all of
    :func:`canonical_nodes`'s votes are marginals of this table."""
    return linked_mentions.groupBy(
        "entity_id", "canonical_name", "link_kind"
    ).agg(F.count(F.lit(1)).alias("cnt"))


def canonical_nodes_from_votes(
    ent_votes: DataFrame, ent_comp: DataFrame
) -> DataFrame:
    """:func:`canonical_nodes` computed from pre-aggregated vote counts
    (:func:`entity_vote_counts`) plus an ``(entity_id, component)`` map
    instead of raw mentions. Exactly equal to ``canonical_nodes`` when
    ``ent_comp`` is the per-entity component of
    :func:`canonical_components` (component is a function of entity
    there, so summing counts reproduces mention counts; same
    deterministic tie-breaks) — pinned by
    ``test_components.test_nodes_from_votes_match``. This is the
    incremental compactor's node builder: every input here is
    dimension-sized (entity vocabulary), never corpus-sized."""
    v = ent_votes.join(ent_comp, "entity_id")
    ec = v.groupBy("component", "entity_id").agg(F.sum("cnt").alias("c"))
    rep = ec.groupBy("component").agg(
        F.min(F.struct((-F.col("c")).alias("nc"), F.col("entity_id")))
        .getField("entity_id")
        .alias("canonical_id"),
        F.sum("c").alias("n_mentions"),
    )

    def modal(col: str, alias: str) -> DataFrame:
        counts = v.groupBy("component", col).agg(F.sum("cnt").alias("c"))
        return counts.groupBy("component").agg(
            F.min(F.struct((-F.col("c")).alias("nc"), F.col(col)))
            .getField(col)
            .alias(alias)
        )

    per_component = (
        rep.join(modal("canonical_name", "canonical_name"), "component")
        .join(modal("link_kind", "kind"), "component")
    )
    return (
        per_component.groupBy(F.col("canonical_id").alias("entity_id"))
        .agg(
            F.min(
                F.struct(
                    (-F.col("n_mentions")).alias("nm"),
                    F.col("canonical_name"),
                    F.col("kind"),
                )
            ).alias("_w"),
            F.sum("n_mentions").alias("n_mentions"),
        )
        .select(
            "entity_id",
            F.col("_w.canonical_name").alias("canonical_name"),
            F.col("_w.kind").alias("kind"),
            "n_mentions",
        )
    )


def entity_canonical_map(
    linked_mentions: DataFrame, components: DataFrame
) -> DataFrame:
    """(entity_id, canonical_id): every linked entity mapped to its
    component's representative — the SAME :func:`_component_entity_vote`
    :func:`canonical_nodes` uses, so the map and the node table agree
    by construction. Entities whose component representative is
    themselves map to themselves. An entity split across components
    (possible when its surfaces never co-occur) takes the modal
    representative over its mentions (deterministic ``min(struct(-count,
    canonical_id))`` tie-break). Dimension-sized output: bounded by the
    entity vocabulary, never the corpus."""
    lm = linked_mentions.select("mention_id", "entity_id")
    joined = components.select("mention_id", "component").join(lm, "mention_id")
    rep = _component_entity_vote(linked_mentions, components).select(
        "component", "canonical_id"
    )
    counts = (
        joined.join(rep, "component")
        .groupBy("entity_id", "canonical_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.groupBy("entity_id").agg(
        F.min(F.struct((-F.col("c")).alias("nc"), F.col("canonical_id")))
        .getField("canonical_id")
        .alias("canonical_id")
    )


def canonical_edges(
    edges: DataFrame, linked_mentions: DataFrame, components: DataFrame
) -> DataFrame:
    """Edge table with subj/obj rewritten to canonical (component-
    representative) entity ids — the referentially-closed view whose
    every endpoint exists in :func:`canonical_nodes`.

    The raw ``edges`` output keeps per-mention LINKED entity ids
    because that is the reference-parity surface (span/triple equality
    is defined pre-canonicalization); the node table is
    post-canonicalization. This operator closes the seam: a
    ``dq_audit`` ref-rule of canonical_edges against canonical_nodes
    passes 100% where raw edges legitimately do not (e.g. an ambiguous
    surface whose minority sense lost the component vote appears as a
    raw edge object but owns no node row).

    Scale shape: the rewrite is two joins against the dimension-sized
    entity map — broadcast, map-only, zero shuffles of the edge table;
    row count and evidence provenance are preserved exactly.
    """
    m = entity_canonical_map(linked_mentions, components)
    subj_map = F.broadcast(
        m.select(F.col("entity_id").alias("subj"), F.col("canonical_id").alias("_cs"))
    )
    obj_map = F.broadcast(
        m.select(F.col("entity_id").alias("obj"), F.col("canonical_id").alias("_co"))
    )
    return (
        edges.join(subj_map, "subj", "left")
        .join(obj_map, "obj", "left")
        .select(
            F.coalesce("_cs", "subj").alias("subj"),
            "pred",
            F.coalesce("_co", "obj").alias("obj"),
            "doc_id",
            "evidence",
        )
    )


def component_stats(edges: DataFrame,
                    components: DataFrame | None = None) -> DataFrame:
    """Per-component structural audit over an undirected edge list
    (u < v, distinct): (component, n_nodes, n_edges, max_degree,
    density) — the KG-QA summary that turns "canonicalization ran" into
    numbers reviewers can gate on (a near-complete component with
    density ~1 is usually an over-merged entity; a huge sparse one is a
    hub alias absorbing everything).

    ``components`` is the (node, component) labeling to audit; when
    None it is computed with :func:`connected_components` (min-id
    labels). Every edge lies inside one component by construction, so
    n_edges attributes each edge via its u-endpoint's label.

    100 TB shape: three partial-aggregable aggregations (node counts,
    edge counts via one equi-join on node id, degree max) meeting in
    component-cardinality joins — AQE broadcasts the small side; no
    windows, no collects, no payload columns anywhere.
    """
    if components is None:
        components = connected_components(edges)
    comp = components.select("node", "component")
    n_nodes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    n_edges = (
        edges.join(comp.withColumnRenamed("node", "u"), "u")
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    sym = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    degree = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    max_deg = (
        degree.join(comp.withColumnRenamed("node", "u"), "u")
        .groupBy("component")
        .agg(F.max("d").alias("max_degree"))
    )
    n_d = F.col("n_nodes").cast("double")
    return (
        n_nodes.join(n_edges, "component")
        .join(max_deg, "component")
        .select(
            "component",
            "n_nodes",
            "n_edges",
            "max_degree",
            F.when(
                F.col("n_nodes") > 1,
                F.round(
                    (F.lit(2.0) * F.col("n_edges").cast("double"))
                    / (n_d * (n_d - F.lit(1.0))),
                    6,
                ),
            ).alias("density"),
        )
    )
