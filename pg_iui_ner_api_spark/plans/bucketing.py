"""Bucketed table materialization — shuffle-free co-located joins.

The KG output tables are re-joined constantly downstream (edges to
nodes on entity id, mentions to edges on doc_id, incremental batches to
the existing graph). At 10^12 documents every such join pays a full
shuffle of both sides UNLESS the tables are bucketed on the join key:
``bucketBy(n, key)`` hash-partitions rows into a fixed number of files
per partition at WRITE time, and Spark's scan reports the resulting
HashPartitioning, so a join of two tables bucketed on the same key with
the same bucket count needs ZERO Exchange — the sort-merge join reads
co-located buckets directly (tests/test_plans.py pins this).

Bucketing requires a catalog table (``saveAsTable``); plain
``.parquet(path)`` writes carry no bucket metadata. On a real cluster
this is the Iceberg/Hive table the pipeline materializes into; locally
the session's warehouse dir serves.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _clear_orphan_location(spark: SparkSession, table: str) -> None:
    """A session killed between ``df.write`` and catalog commit can leave
    the warehouse directory on disk with no catalog entry; a later
    ``saveAsTable`` then fails with LOCATION_ALREADY_EXISTS. Managed
    tables only — if the catalog knows the table, ``mode("overwrite")``
    handles it and we must not touch the files behind its back."""
    if spark.catalog.tableExists(table):
        return
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    if not warehouse:
        return
    loc = f"{warehouse.rstrip('/')}/{table.split('.')[-1].lower()}"
    shutil.rmtree(loc, ignore_errors=True)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 64, sort: bool = True) -> None:
    """Materialize ``df`` as a bucketed (and in-bucket sorted) catalog
    table. Sorting by the bucket key lets the co-located join skip its
    per-bucket sort too (full sort-merge join with neither Exchange nor
    Sort on either side)."""
    _clear_orphan_location(df.sparkSession, table)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
