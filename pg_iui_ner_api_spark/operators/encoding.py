"""Dictionary encoding — stable dense integer ids for string keys.

A KG at corpus scale keys everything by entity/relation STRINGS
(canonical names, URIs — the reference's per-request API returns
entity `word` strings, /root/reference/src/routers/main_endpoints.py:
129-176). Every downstream graph operator then shuffles those strings.
The standard fix — the first thing every production KG / columnar
engine does — is dictionary encoding: assign each distinct string a
dense ``long`` id once, and let joins/aggregations/iterative graph ops
carry 8-byte ids instead of arbitrary-length text.

``dictionary_encode`` assigns GLOBALLY DENSE 0-based ids
deterministically (a pure function of the value set, independent of
partitioning and cluster size) without the classic scale killer — a
global row_number window that funnels the whole dimension through one
partition:

  1. hash each distinct value into ``buckets`` buckets
     (``portable_hash64 % B`` — the md5-based hash that is bit-identical
     in DuckDB, so the whole assignment is oracle-checkable);
  2. rank WITHIN each bucket by value (``buckets`` independent window
     sorts — the same shape as ``negatives.node_index`` /
     ``packing.shuffle_corpus``);
  3. offset each bucket by the exclusive prefix sum of bucket counts.
     The offsets table is ``B`` rows — a bounded single-partition
     window, then a broadcast join back.

The resulting id equals ``row_number() OVER (ORDER BY bucket, value)-1``
— which is exactly the one-line DuckDB oracle — but no row ever crosses
a single-partition boundary except the B-row offsets table.

Scale shape: one distinct-shuffle over the values, one hash shuffle on
the bucket id, one broadcast join. Encoding a fact table is one equi-
join against the mapping (broadcast-able whenever the dictionary fits,
which for entity dimensions it almost always does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import portable_hash64


def dictionary_encode(
    df: DataFrame,
    col: str,
    buckets: int = 64,
) -> DataFrame:
    """Distinct non-null values of ``df[col]`` -> ``(value, id)`` with
    ``id`` dense in ``[0, n_distinct)``, deterministic across runs,
    partitionings, and cluster sizes."""
    vals = (
        df.select(F.col(col).alias("value"))
        .where(F.col("value").isNotNull())
        .distinct()
        .withColumn(
            "bucket",
            F.pmod(portable_hash64(F.col("value").cast("string")), F.lit(buckets))
            .cast("int"),
        )
    )
    in_bucket = Window.partitionBy("bucket").orderBy("value")
    ranked = vals.withColumn(
        "rank", (F.row_number().over(in_bucket) - 1).cast("long")
    )
    # B-row exclusive prefix sum; single-partition window is bounded by
    # construction (B rows), then broadcasts into the final join
    counts = ranked.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    off_w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = counts.select(
        "bucket", (F.sum("n").over(off_w) - F.col("n")).alias("offset")
    )
    return (
        ranked.join(F.broadcast(offsets), "bucket")
        .select("value", (F.col("offset") + F.col("rank")).alias("id"))
    )


def encode_column(
    df: DataFrame,
    mapping: DataFrame,
    col: str,
    id_col: str | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """Replace ``df[col]`` with its dictionary id (left join, so values
    absent from the mapping — including NULL — get a NULL id; the caller
    decides whether that is an error). ``broadcast=False`` for
    dictionaries too large to ship — AQE then picks the join strategy."""
    id_col = id_col or f"{col}_id"
    m = mapping.select(
        F.col("value").alias(col), F.col("id").alias(id_col)
    )
    if broadcast:
        m = F.broadcast(m)
    return df.join(m, col, "left").drop(col)


def decode_column(
    df: DataFrame,
    mapping: DataFrame,
    id_col: str,
    col: str,
) -> DataFrame:
    """Inverse of :func:`encode_column` (left join on the id)."""
    m = F.broadcast(
        mapping.select(F.col("id").alias(id_col), F.col("value").alias(col))
    )
    return df.join(m, id_col, "left").drop(id_col)
