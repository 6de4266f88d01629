"""SparkSession factory with scale-oriented defaults.

All knobs here are plain public Spark conf. They are chosen for the
100 TB target (AQE on, skew-join splitting on, nested-schema pruning so
media-only queries never read ``spans.text``), then sized down by the
caller for local tests via ``shuffle_partitions``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pg-iui-ner-api-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so the same entrypoints serve pytest, bench.py and spark-submit; on a
    real cluster the caller simply omits ``master`` and lets
    spark-submit supply it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    # Each Python UDF worker inherits this env; numpy/BLAS default to
    # ncpu threads PER WORKER, so N workers oversubscribe N*ncpu threads
    # and throughput collapses as parallelism grows. One BLAS thread per
    # worker — Spark supplies the parallelism.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "NUMEXPR_NUM_THREADS", "VECLIB_MAXIMUM_THREADS"):
        os.environ.setdefault(var, "1")
    # Throughput GC: G1's concurrent refinement anti-scales badly on
    # virtualized hosts (measured 2x wall-clock at local[32] on this
    # sandbox); ParallelGC is the right choice for batch ETL anyway.
    # SPARK_SUBMIT_OPTS reaches the driver JVM that pyspark launches.
    if "-XX:+Use" not in os.environ.get("SPARK_SUBMIT_OPTS", ""):
        os.environ["SPARK_SUBMIT_OPTS"] = (
            os.environ.get("SPARK_SUBMIT_OPTS", "") + " -XX:+UseParallelGC"
        ).strip()
    if shuffle_partitions is None:
        # one shuffle partition per core locally; a real cluster would
        # size this to ~2-3x total cores (AQE coalesces the excess).
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- adaptive execution: runtime re-planning, skew-join splitting
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # --- Arrow: the JVM<->Python boundary for every pandas UDF
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # --- nested column pruning: media-only queries must not read spans.text
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        # --- parquet scan sizing (128 MiB splits, the cluster default)
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # executors on a real cluster get the same throughput GC
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Register the driver testdata parquet files as temp views.

    Mirrors the DuckDB-oracle harness, which pre-registers the same
    views; keeps our SQL-expressible queries runnable verbatim via
    ``spark.sql``.
    """
    all_names = names or (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    out = {}
    for n in all_names:
        df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        df.createOrReplaceTempView(n)
        out[n] = df
    return out
