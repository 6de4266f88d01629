"""Registry maintenance tests: copy-on-write insert/upsert/update/delete
semantics (SURVEY §2.10) and the liveness reconciliation anti-join."""

from pyspark.sql import functions as F

from pg_iui_ner_api_spark.sources import registry as R


def test_bootstrap_is_idempotent(spark, tmp_path):
    reg = R.bootstrap_model_registry(spark, str(tmp_path))
    first = sorted(r["base_model"] for r in reg.read().collect())
    reg2 = R.bootstrap_model_registry(spark, str(tmp_path))
    again = sorted(r["base_model"] for r in reg2.read().collect())
    assert first == again == ["roberta_eng", "roberta_pl"]


def test_insert_update_delete_roundtrip(spark, tmp_path):
    reg = R.bootstrap_model_registry(spark, str(tmp_path))
    row = reg.read().where(F.col("id") == 1).withColumn("id", F.lit(77)).withColumn(
        "model_name", F.lit("custom")
    ).withColumn("is_trained", F.lit(False))
    reg.insert(row)
    assert reg.read().count() == 3

    # U3: mark training progress like execute_training does
    reg.update("id", 77, {"is_training": True, "epoch": 2})
    got = reg.read().where(F.col("id") == 77).collect()[0]
    assert got["is_training"] is True and got["epoch"] == 2
    # other rows untouched
    assert reg.read().where(F.col("id") == 1).collect()[0]["is_training"] is False

    # U4: delete by id
    reg.delete(F.col("id") == 77)
    assert reg.read().count() == 2


def test_versions_accumulate_and_current_moves(spark, tmp_path):
    import os

    reg = R.bootstrap_model_registry(spark, str(tmp_path))
    reg.update("id", 1, {"epoch": 5})
    vdirs = [d for d in os.listdir(reg.dir) if d.startswith("v_")]
    assert len(vdirs) >= 2  # snapshots are immutable; _current repoints
    with open(os.path.join(reg.dir, "_current")) as f:
        assert f.read().strip() == sorted(vdirs, key=lambda v: int(v[2:]))[-1]


def test_reconcile_dead_processes(spark, tmp_path):
    reg = R.process_registry(spark, str(tmp_path))
    reg.insert(
        spark.createDataFrame(
            [("100", "train_a"), ("200", "train_b"), ("300", "train_c")],
            reg.schema,
        )
    )
    live = spark.createDataFrame([("100", "train_a")], "pid string, name string")
    dead = R.reconcile_dead_processes(reg, live)
    assert {r["pid"] for r in dead.collect()} == {"200", "300"}
    assert {r["pid"] for r in reg.read().collect()} == {"100"}


def test_time_travel_and_rollback(spark, tmp_path):
    """VERSION-AS-OF reads + Iceberg-style rollback (restore = a NEW
    version; history stays linear and auditable)."""
    from pg_iui_ner_api_spark.sources.registry import ParquetRegistry

    import pytest as _pt

    reg = ParquetRegistry(spark, str(tmp_path), "tt", "id long, v string")
    reg.insert(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    reg.update("id", 2, {"v": "b2"})
    reg.delete(__import__("pyspark.sql.functions", fromlist=["col"]).col("id") == 1)

    assert reg.versions() == [0, 1, 2]
    assert {(r["id"], r["v"]) for r in reg.read(0).collect()} == {(1, "a"), (2, "b")}
    assert {(r["id"], r["v"]) for r in reg.read(1).collect()} == {(1, "a"), (2, "b2")}
    assert {(r["id"], r["v"]) for r in reg.read().collect()} == {(2, "b2")}

    reg.rollback(0)
    assert reg.versions() == [0, 1, 2, 3]       # restore appended, not rewrote
    assert {(r["id"], r["v"]) for r in reg.read().collect()} == {(1, "a"), (2, "b")}
    with _pt.raises(ValueError):
        reg.read(99)


def test_partial_snapshot_is_not_committed(spark, tmp_path):
    """A v_<n> directory left by a crash between df.write and the
    _current repoint must never be listed, read, or rolled back — only
    the committed history counts (atomic-swap guarantee)."""
    import os
    import pytest as _pt

    from pg_iui_ner_api_spark.sources.registry import ParquetRegistry

    reg = ParquetRegistry(spark, str(tmp_path), "pt", "id long, v string")
    reg.insert(spark.createDataFrame([(1, "a")], "id long, v string"))
    assert reg.versions() == [0]

    # simulate the crash: v_1 written (even with _SUCCESS) but _current
    # still points at v_0
    spark.createDataFrame([(9, "partial")], "id long, v string").write.mode(
        "overwrite"
    ).parquet(os.path.join(reg.dir, "v_1"))
    # and a truly partial v_2: no _SUCCESS marker at all
    os.makedirs(os.path.join(reg.dir, "v_2"), exist_ok=True)

    assert reg.versions() == [0]
    with _pt.raises(ValueError):
        reg.read(1)
    with _pt.raises(ValueError):
        reg.rollback(1)
    # the next real commit overwrites the orphan dir and moves _current
    reg.update("id", 1, {"v": "a2"})
    assert reg.versions() == [0, 1]
    assert {(r["id"], r["v"]) for r in reg.read(1).collect()} == {(1, "a2")}


def test_snapshot_diff_cdc_over_time_travel(spark, tmp_path):
    """snapshot_diff composed with version time travel is the CDC feed
    between two committed versions: insert + update + delete all show
    up with old/new values; unchanged rows are omitted; same-version
    diff is empty."""
    from pg_iui_ner_api_spark.sources.registry import ParquetRegistry, snapshot_diff

    reg = ParquetRegistry(spark, str(tmp_path), "cdc", "id long, v string")
    reg.insert(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string"))
    v1 = reg.versions()[-1]
    reg.update("id", 2, {"v": "B"})
    reg.delete(F.col("id") == 3)
    reg.insert(spark.createDataFrame([(4, "d")], "id long, v string"))
    v2 = reg.versions()[-1]

    diff = {
        r["id"]: (r["op"], r["v_old"], r["v_new"])
        for r in snapshot_diff(reg.read(version=v1), reg.read(version=v2), ["id"]).collect()
    }
    assert diff == {
        2: ("update", "b", "B"),
        3: ("delete", "c", None),
        4: ("insert", None, "d"),
    }
    assert 1 not in diff  # unchanged rows omitted
    same = snapshot_diff(reg.read(version=v2), reg.read(version=v2), ["id"])
    assert same.count() == 0


def test_snapshot_diff_null_safe_and_args(spark):
    from pg_iui_ner_api_spark.sources.registry import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, "x")], "id long, v string")
    new = spark.createDataFrame([(1, None), (2, None)], "id long, v string")
    got = {r["id"]: r["op"] for r in snapshot_diff(old, new, ["id"]).collect()}
    # NULL == NULL is unchanged; value -> NULL is an update
    assert got == {2: "update"}
    import pytest as _pt

    with _pt.raises(ValueError):
        snapshot_diff(old, new, [])
