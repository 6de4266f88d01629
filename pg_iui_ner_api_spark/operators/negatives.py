"""Negative sampling for KG-embedding training data.

Translation-embedding models (TransE, Bordes et al. 2013, and its
descendants) train on corrupted triples: for every true (subj, pred,
obj) edge, replace the head or tail with a random entity and require
the model to score the true triple higher. Producing that training set
at KG scale is a data-engineering problem — sample uniformly from a
10^9-entity dimension, per edge, several times, WITHOUT a global index
— and this module solves it deterministically:

* **No global row_number.** A single-partition window over the node dim
  is the classic scale killer. Nodes are hashed into ``buckets``
  buckets; the index is a row_number WITHIN each bucket (``buckets``
  independent window sorts after one hash shuffle — same shape as
  ``shuffle_corpus``).
* **Deterministic "randomness".** The corruption side, the target
  bucket, and the in-bucket index all derive from md5 chains over
  (seed, the triple, the replica ordinal) — the sample is a pure
  function of its inputs, rerun/partitioning/engine-stable, and
  therefore exactly DuckDB-oracle-checkable. Uniform within a bucket,
  multinomial across buckets (the bucket populations themselves are
  hash-uniform), which is the standard hashing trade.
* **Closed-world filter, never silent.** Corruptions that collide with
  a TRUE edge, or replace an endpoint with itself, are dropped via an
  anti-join / inequality filter — the well-known false-negative guard —
  so replicas are requested (``n_neg``) but the emitted count per edge
  can be lower; downstream re-requests with a different seed if it
  needs exact counts.

Scale shape: the per-bucket size table (``buckets`` rows) broadcasts;
the replacement lookup is one equi-join on (bucket, idx) against the
node dim; the anti-join keys on the triple. Edges are exploded
``n_neg``-fold but every shuffled row is (three ids + tiny ints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import portable_hash64


def _h(seed: str, *cols, tag: str):
    return portable_hash64(
        F.concat_ws("|", F.lit(seed), *[c.cast("string") for c in cols], F.lit(tag))
    )


def node_index(nodes: DataFrame, buckets: int = 64,
               node_col: str = "node") -> DataFrame:
    """(node, bucket, idx) — per-bucket dense 0-based index of the node
    dim; idx is windowed per bucket, never globally."""
    b = F.pmod(portable_hash64(F.col(node_col).cast("string")), F.lit(buckets))
    w = Window.partitionBy("bucket").orderBy("node")
    return (
        nodes.select(F.col(node_col).alias("node"), b.cast("int").alias("bucket"))
        .withColumn("idx", (F.row_number().over(w) - 1).cast("long"))
    )


def negative_triples(edges: DataFrame, n_neg: int = 2, seed: str = "s0",
                     buckets: int = 64) -> DataFrame:
    """Corrupted-triple training rows for a (subj, pred, obj) edge list:
    ``(subj, pred, obj, neg_idx, corrupt_side, neg_subj, neg_obj)``
    where exactly one endpoint is replaced (``corrupt_side`` in
    {'subj','obj'}), the replacement is drawn deterministically from
    the edge's own entity universe, and corruptions equal to a true
    edge or to the original endpoint are filtered out.
    """
    e0 = edges.select("subj", "pred", "obj").localCheckpoint()  # 3 consumers
    nodes = (
        e0.select(F.col("subj").alias("node"))
        .unionAll(e0.select(F.col("obj").alias("node")))
        .distinct()
    )
    dim = node_index(nodes, buckets).localCheckpoint()
    # Replicas select among the NON-EMPTY buckets by dense rank, so a
    # hash landing where no node lives can't silently drop the replica
    # (an early version joined on the raw bucket id and lost every
    # replica hashed to an empty bucket — fatal when the entity
    # universe is small relative to ``buckets``). The rank window runs
    # over the <= ``buckets``-row size table, not data.
    sizes = (
        dim.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("bsize"))
        .withColumn(
            "brank",
            (F.row_number().over(Window.orderBy("bucket")) - 1).cast("long"),
        )
    )
    nb = sizes.agg(F.count(F.lit(1)).alias("nb"))
    s, p, o = F.col("subj"), F.col("pred"), F.col("obj")
    cand = e0.select(
        "subj", "pred", "obj",
        F.explode(F.sequence(F.lit(0), F.lit(n_neg - 1))).alias("neg_idx"),
    )
    i = F.col("neg_idx")
    cand = cand.join(F.broadcast(nb)).select(
        "subj", "pred", "obj", "neg_idx",
        F.pmod(_h(seed, s, p, o, i, tag="s"), F.lit(2)).cast("int").alias("side"),
        F.pmod(_h(seed, s, p, o, i, tag="b"), F.col("nb")).alias("brank"),
        _h(seed, s, p, o, i, tag="j").alias("jh"),
    )
    cand = cand.join(F.broadcast(sizes), "brank").select(
        "subj", "pred", "obj", "neg_idx", "side", "bucket",
        F.pmod(F.col("jh"), F.col("bsize")).alias("idx"),
    )
    cand = cand.join(dim, ["bucket", "idx"]).select(
        "subj", "pred", "obj", "neg_idx",
        F.when(F.col("side") == 0, F.lit("subj")).otherwise(F.lit("obj")).alias("corrupt_side"),
        F.when(F.col("side") == 0, F.col("node")).otherwise(s).alias("neg_subj"),
        F.when(F.col("side") == 0, o).otherwise(F.col("node")).alias("neg_obj"),
    )
    # self-corruption guard: the replacement must change the triple
    cand = cand.where(
        ((F.col("corrupt_side") == "subj") & (F.col("neg_subj") != s))
        | ((F.col("corrupt_side") == "obj") & (F.col("neg_obj") != o))
    )
    # closed-world guard: the corrupted triple must not be a true edge
    truth = e0.select(
        F.col("subj").alias("neg_subj"), "pred", F.col("obj").alias("neg_obj")
    )
    return cand.join(truth, ["neg_subj", "pred", "neg_obj"], "left_anti")
