"""Compaction planning: pack variable-size items into target-size bins.

Provenance: the reference ingests one record per HTTP request
(/root/reference/src/routers/main_endpoints.py:118-176), so its storage
accretes row-at-a-time writes; at corpus scale the same pattern
produces the classic small-files problem, and every table format's
maintenance story (Iceberg rewrite_data_files, Delta OPTIMIZE, Spark's
own FilePartition packing under files.maxPartitionBytes) is "pack
small files into target-size outputs". This module is that planner as
a DataFrame operator.

Algorithm — cumulative-split packing: within each group, order items
deterministically, take the EXCLUSIVE running sum of sizes, and assign
``bin = exclusive_cumsum DIV target``. This is the distributed-friendly
form of greedy first-fit used by Spark's own file packing:

  * bounded overflow: a bin's total is < target + max_item_size (an
    item is only added while the running sum is still inside the bin's
    [b*target, (b+1)*target) span);
  * items larger than ``target`` span multiple bin indexes, so the
    NEXT item always starts a fresh index — no later item ever shares
    an oversize item's bin (earlier items in the same span may). They
    are flagged ``oversize`` so a caller can route them to a
    split/rewrite path;
  * bins are contiguous in item order and the assignment is
    partitioning-independent (pure function of the sorted group).

100 TB shape: compaction plans over FILE MANIFESTS (one row per file —
millions of rows for a petabyte table, not the data itself). One hash
shuffle on the group key, one within-group sort window carrying only
(id, size); all arithmetic is exact integer DIV, so the plan hashes
identically on any engine. Same window discipline as
operators/packing.py::pack_sequences (only narrow columns enter the
sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def plan_compaction(
    files: DataFrame,
    group_cols: list[str],
    file_col: str,
    size_col: str,
    target: int,
) -> DataFrame:
    """Assign every file to a compaction bin within its group.

    Returns the input's (group_cols, file_col, size_col) plus ``bin``
    (0-based, contiguous in ``file_col`` order, total < target +
    max_size) and ``oversize`` (size >= target: the file deserves its
    own rewrite). Rows with NULL or negative size are dropped — a
    manifest row without a size is corrupt and must not silently skew
    bin totals.
    """
    if target <= 0:
        raise ValueError("target must be positive")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return (
        files.where(F.col(size_col).isNotNull() & (F.col(size_col) >= 0))
        .select(*group_cols, file_col, size_col)
        .withColumn("_cum", cum.cast("long"))
        # integer DIV, never float division: exact past 2^53 (the same
        # rule operators/packing.py pins for shard arithmetic)
        .withColumn("bin", F.expr(f"_cum DIV CAST({int(target)} AS BIGINT)"))
        .withColumn("oversize", F.col(size_col) >= F.lit(int(target)))
        .drop("_cum")
    )


def compaction_manifest(
    plan: DataFrame, group_cols: list[str], size_col: str
) -> DataFrame:
    """Per-bin rollup of a `plan_compaction` output: file count, total
    bytes, and whether the bin holds an oversize file — the operational
    surface a rewrite job consumes. One partial-aggregable groupBy."""
    return plan.groupBy(*group_cols, "bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(size_col).alias("total_bytes"),
        F.max("oversize").alias("has_oversize"),
    )
