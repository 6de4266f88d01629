"""Model/process registry tables with row-level maintenance ops
(SURVEY.md §2.10 U1-U4, S8).

The reference keeps its registries in SQLite with SQLAlchemy point
updates (/root/reference/src/utils/crud.py:8-215, database/tools.py).
The engine equivalent is an Iceberg table with MERGE/UPDATE/DELETE; in
this sandbox there is no Iceberg runtime jar, so this module provides
the same SEMANTICS over plain parquet with an atomic version-directory
swap — the classic copy-on-write table format in miniature:

    <root>/<table>/v_<n>/part-*.parquet     immutable version snapshots
    <root>/<table>/_current                 file naming the live version

Every mutation reads the current snapshot, computes the next DataFrame
declaratively (the ops below are anti-join/union/when-otherwise — the
exact plans Iceberg's COW MERGE produces), writes v_<n+1>, then
atomically repoints _current. Readers never see partial state; crash
mid-write leaves _current untouched (idempotent retry), which is the
same guarantee the reference gets from SQLite transactions.

On a real cluster the identical call sites run `MERGE INTO` /
`UPDATE` / `DELETE FROM` against an Iceberg catalog — the flag
``use_iceberg`` switches to SQL passthrough when a catalog is present.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schema as S


class ParquetRegistry:
    """Versioned copy-on-write table with upsert/update/delete."""

    def __init__(self, spark: SparkSession, root: str, name: str, schema):
        self.spark = spark
        self.dir = os.path.join(root, name)
        self.schema = schema
        os.makedirs(self.dir, exist_ok=True)

    # -- snapshot plumbing -------------------------------------------------
    def _current_path(self) -> str | None:
        marker = os.path.join(self.dir, "_current")
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            v = f.read().strip()
        return os.path.join(self.dir, v)

    def _commit(self, df: DataFrame) -> None:
        cur = self._current_path()
        n = 0 if cur is None else int(os.path.basename(cur).split("_")[1]) + 1
        vdir = os.path.join(self.dir, f"v_{n}")
        df.write.mode("overwrite").parquet(vdir)
        tmp = os.path.join(self.dir, "_current.tmp")
        with open(tmp, "w") as f:
            f.write(f"v_{n}")
        os.replace(tmp, os.path.join(self.dir, "_current"))  # atomic repoint

    # -- read (with time travel) -------------------------------------------
    def read(self, version: int | None = None) -> DataFrame:
        """Current snapshot, or any retained historical ``version`` —
        the COW analogue of Iceberg's ``VERSION AS OF`` time travel
        (snapshots are immutable directories, so historical reads cost
        nothing and run concurrently with writers)."""
        if version is not None:
            vdir = os.path.join(self.dir, f"v_{version}")
            if version not in self.versions() or not os.path.isdir(vdir):
                raise ValueError(
                    f"no committed snapshot v_{version} in {self.dir}"
                )
            return self.spark.read.schema(self.schema).parquet(vdir)
        cur = self._current_path()
        if cur is None:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(cur)

    def _current_version(self) -> int | None:
        cur = self._current_path()
        return None if cur is None else int(os.path.basename(cur).split("_")[1])

    def versions(self) -> list[int]:
        """COMMITTED snapshot ids, oldest first (Iceberg: snapshot log).

        A ``v_<n>`` directory is committed only if ``n`` is at or below
        the version ``_current`` points to AND Spark's ``_SUCCESS``
        marker landed — a partially-written snapshot left by a crash
        between ``df.write`` and the ``_current`` repoint must never be
        listed (or ``rollback`` would commit partial data as a new live
        version, defeating the atomic-swap guarantee)."""
        cur_v = self._current_version()
        if cur_v is None:
            return []
        vs = [
            n
            for d in os.listdir(self.dir)
            if d.startswith("v_") and d.split("_")[1].isdigit()
            and (n := int(d.split("_")[1])) <= cur_v
            and os.path.exists(os.path.join(self.dir, d, "_SUCCESS"))
        ]
        return sorted(vs)

    def rollback(self, version: int) -> None:
        """Restore a historical snapshot by committing its content as a
        NEW version (Iceberg's rollback semantics: history stays linear
        and append-only; nothing is deleted, the bad versions remain
        auditable). Only COMMITTED versions are restorable."""
        if version not in self.versions():
            raise ValueError(
                f"v_{version} is not a committed snapshot of {self.dir} "
                f"(committed: {self.versions()})"
            )
        self._commit(self.read(version))

    # -- U1: append insert -------------------------------------------------
    def insert(self, rows: DataFrame) -> None:
        self._commit(self.read().unionByName(rows))

    # -- U2: idempotent get-or-create (MERGE WHEN NOT MATCHED INSERT) ------
    def upsert_if_absent(self, rows: DataFrame, key_cols: list[str]) -> None:
        """Insert rows whose key is not already present (reference
        create_models seeding, tools.py:21-40)."""
        cur = self.read()
        fresh = rows.join(cur.select(*key_cols), key_cols, "left_anti")
        self._commit(cur.unionByName(fresh))

    # -- U3: point update (UPDATE ... WHERE key = x) ------------------------
    def update(self, key_col: str, key, assignments: dict[str, object]) -> None:
        """Set columns on matching rows; when-otherwise per column is the
        COW form of Iceberg's row-level UPDATE."""
        cur = self.read()
        cond = F.col(key_col) == F.lit(key)
        out = cur
        for col, val in assignments.items():
            out = out.withColumn(col, F.when(cond, F.lit(val)).otherwise(F.col(col)))
        self._commit(out)

    # -- U4: delete (DELETE FROM ... WHERE) ---------------------------------
    def delete(self, predicate) -> None:
        self._commit(self.read().where(~predicate))


# -- Iceberg passthrough (the real-cluster form of the ops above) ----------
#
# The sandbox has no Iceberg runtime jar and no network to fetch one
# (verified round 4: ~/.ivy2 empty, pypi unreachable), so these row-level
# statements cannot EXECUTE here. What can be verified without a catalog:
#   1. the generated SQL is exactly what an Iceberg catalog accepts
#      (pinned as goldens in tests/test_registry_iceberg_sql.py), and
#   2. it is syntactically valid Spark SQL — parsed by Spark's own
#      parser (MERGE INTO / UPDATE / DELETE FROM are in the grammar
#      independent of any catalog), and
#   3. the SEMANTICS match the COW path — the DuckDB contract test
#      (tests/test_registry_contract.py) replays equivalent row-level SQL
#      against an independent engine and asserts state parity.


def _sql_lit(v: object) -> str:
    """Render a Python value as a Spark SQL literal."""
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    s = str(v).replace("\\", "\\\\").replace("'", "\\'")
    return f"'{s}'"


def merge_if_absent_sql(table: str, source_view: str, key_cols: list[str]) -> str:
    """U2 as Iceberg row-level SQL: MERGE WHEN NOT MATCHED INSERT —
    the statement `upsert_if_absent` (anti-join + union COW) emulates."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    return (
        f"MERGE INTO {table} t\n"
        f"USING {source_view} s\n"
        f"ON {on}\n"
        f"WHEN NOT MATCHED THEN INSERT *"
    )


def update_sql(table: str, key_col: str, key: object,
               assignments: dict[str, object]) -> str:
    """U3 as Iceberg row-level SQL (what `update` emulates via
    when/otherwise column rewrites)."""
    sets = ", ".join(f"{c} = {_sql_lit(v)}" for c, v in assignments.items())
    return f"UPDATE {table} SET {sets} WHERE {key_col} = {_sql_lit(key)}"


def delete_sql(table: str, predicate_sql: str) -> str:
    """U4 as Iceberg row-level SQL (what `delete` emulates via an
    inverted filter + COW rewrite)."""
    return f"DELETE FROM {table} WHERE {predicate_sql}"


def time_travel_sql(table: str, version: int) -> str:
    """`read(version=)` as Iceberg time travel."""
    return f"SELECT * FROM {table} VERSION AS OF {version}"


def rollback_sql(table: str, version: int) -> str:
    """`rollback` as the Iceberg stored procedure (catalog-qualified
    tables: CALL <catalog>.system.rollback_to_snapshot(<tbl>, <snap>))."""
    catalog, _, rest = table.partition(".")
    if not rest:
        catalog, rest = "spark_catalog", table
    return (
        f"CALL {catalog}.system.rollback_to_snapshot('{rest}', {version})"
    )


class IcebergRegistry:
    """The same registry interface running real row-level SQL against an
    Iceberg catalog (`use_iceberg` mode). Requires the
    iceberg-spark-runtime jar + a configured catalog — absent in this
    sandbox, so only the SQL TEXT path is exercised here (see module
    note above); on a real cluster this class IS the registry.

    Reference analogue: /root/reference/src/utils/crud.py:8-215 runs the
    equivalent SQLAlchemy point statements against SQLite.
    """

    def __init__(self, spark: SparkSession, table: str):
        self.spark = spark
        self.table = table

    def read(self, version: int | None = None) -> DataFrame:
        if version is not None:
            return self.spark.sql(time_travel_sql(self.table, version))
        return self.spark.read.table(self.table)

    def insert(self, rows: DataFrame) -> None:
        rows.writeTo(self.table).append()

    def upsert_if_absent(self, rows: DataFrame, key_cols: list[str]) -> None:
        rows.createOrReplaceTempView("_merge_src")
        self.spark.sql(merge_if_absent_sql(self.table, "_merge_src", key_cols))

    def update(self, key_col: str, key, assignments: dict[str, object]) -> None:
        self.spark.sql(update_sql(self.table, key_col, key, assignments))

    def delete_where(self, predicate_sql: str) -> None:
        self.spark.sql(delete_sql(self.table, predicate_sql))

    def rollback(self, version: int) -> None:
        self.spark.sql(rollback_sql(self.table, version))


def bootstrap_model_registry(spark: SparkSession, root: str) -> ParquetRegistry:
    """S8 + U2: create the registry and seed the EN/PL base-model rows
    (reference tools.py:21-40 + enum.py:6-9), idempotently."""
    import datetime

    reg = ParquetRegistry(spark, root, "model_registry", S.MODEL_REGISTRY)
    # fixed seed date: the reference stamps datetime.now() (tools.py:35),
    # one of its nondeterminism bugs (SURVEY §7) — seeds here are
    # reproducible by construction
    d0 = datetime.date(2026, 1, 1)
    seed = spark.createDataFrame(
        [
            (1, "roberta_eng", "models/roberta_eng", d0, False, "roberta_eng",
             None, None, None, None, True, 1, 0, 0),
            (2, "roberta_pl", "models/roberta_pl", d0, False, "roberta_pl",
             None, None, None, None, True, 1, 0, 0),
        ],
        S.MODEL_REGISTRY,
    )
    reg.upsert_if_absent(seed, ["base_model"])
    return reg


def process_registry(spark: SparkSession, root: str) -> ParquetRegistry:
    return ParquetRegistry(spark, root, "process_registry", S.PROCESS_REGISTRY)


def reconcile_dead_processes(reg: ParquetRegistry, live: DataFrame) -> DataFrame:
    """J1/P6: the liveness anti-join — registry rows with no matching
    live (pid, name) are the dead ones (reference check_and_clean,
    sync_functions.py:22-45). Returns the dead rows and deletes them."""
    cur = reg.read()
    dead = cur.join(live, ["pid", "name"], "left_anti")
    dead_keys = [r["pid"] for r in dead.select("pid").collect()]
    if dead_keys:
        reg.delete(F.col("pid").isin(dead_keys))
    return dead


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str] | None = None) -> DataFrame:
    """Change-data capture between two snapshots of the same table:
    one row per changed key with ``op`` in {insert, delete, update}
    (unchanged keys are omitted). ``compare_cols`` defaults to every
    non-key column present on BOTH sides; comparison is null-safe
    (NULL == NULL is unchanged, NULL vs value is an update).

    Composes with this module's time travel: ``snapshot_diff(
    reg.read(version=a), reg.read(version=b), keys)`` is the CDC feed
    between two committed versions — what an incremental downstream
    consumer replays instead of re-reading the table (the Iceberg
    changelog / Delta CDF shape).

    Scale: ONE full outer join on the key (both sides shuffle once);
    change classification is in-row null checks + null-safe equality,
    so the plan is join + project, no second pass.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns
            if c in set(new.columns) and c not in set(key_cols)
        ]
    o = old.select(
        *[F.col(k).alias(k) for k in key_cols],
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(k) for k in key_cols],
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    j = o.join(n, key_cols, "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    op = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    out_cols = [
        *key_cols,
        op.alias("op"),
        *[F.col(f"_o_{c}").alias(f"{c}_old") for c in compare_cols],
        *[F.col(f"_n_{c}").alias(f"{c}_new") for c in compare_cols],
    ]
    return j.select(*out_cols).where(F.col("op").isNotNull())
