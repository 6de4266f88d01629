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


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """edges(u: long, v: long) -> (node: long, component: long).

    component = min node id reachable from `node`. Nodes appearing only
    as isolated self-loops should not be passed; callers union isolated
    nodes back with component = self.
    """
    e = edges.select("u", "v").where(F.col("u") != F.col("v")).distinct().localCheckpoint()
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


def canonical_components(linked_mentions: DataFrame) -> DataFrame:
    """Mention-level canonicalization graph -> component per mention.

    Edge construction is star-shaped per blocking key (linked entity_id,
    then normalized surface): each mention connects to the minimum
    mention hash in its block — O(n) edges, never the O(n²) pairwise
    self-join, which is what makes this survive hub entities at scale.
    Returns (mention_id, node, component).
    """
    m = linked_mentions.select(
        "mention_id",
        F.xxhash64("mention_id").alias("node"),
        "entity_id",
        F.lower("word").alias("surface"),
    ).localCheckpoint()  # reused by two star constructions + final join

    def star_edges(key: str) -> DataFrame:
        mins = m.groupBy(key).agg(F.min("node").alias("hub"))
        return (
            m.join(mins, key)
            .where(F.col("node") != F.col("hub"))
            .select(F.col("node").alias("u"), F.col("hub").alias("v"))
        )

    edges = star_edges("entity_id").union(star_edges("surface")).distinct()
    cc = connected_components(edges)
    return (
        m.join(cc, "node", "left")
        .select(
            "mention_id",
            "node",
            F.coalesce("component", "node").alias("component"),
            "entity_id",
        )
    )


def canonical_nodes(linked_mentions: DataFrame, components: DataFrame) -> DataFrame:
    """KG node table: one row per canonical entity cluster.

    Representative entity = modal linked entity of the component;
    canonical_name = modal canonical_name (A5 'canonical name vote').
    """
    lm = linked_mentions.select("mention_id", "entity_id", "canonical_name", "link_kind")
    joined = components.select("mention_id", "component").join(lm, "mention_id")
    per_component = joined.groupBy("component").agg(
        F.mode("entity_id").alias("entity_id"),
        F.mode("canonical_name").alias("canonical_name"),
        F.mode("link_kind").alias("kind"),
        F.count(F.lit(1)).alias("n_mentions"),
    )
    return per_component.groupBy("entity_id").agg(
        F.first("canonical_name").alias("canonical_name"),
        F.first("kind").alias("kind"),
        F.sum("n_mentions").alias("n_mentions"),
    )
