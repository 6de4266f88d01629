"""Stage runner: checkpointed stages with per-partition lineage + resume.

North-rule requirement: "per-partition lineage + metrics written
alongside checkpoints so any stage can resume mid-corpus". The
reference's analogue is its crash-recovery scheduler (SQLite process
registry + FileLock, /root/reference/src/sync/sync_functions.py:22-45);
here the same durability comes from idempotent, atomic parquet stage
materialization:

  workdir/<stage>/            parquet output (+ Spark's _SUCCESS marker)
  workdir/_lineage/<stage>.json   {run_id, stage, wall_ms, rows_out,
                                   per-file row counts, input_fingerprint}

Resume: a stage whose _SUCCESS exists and whose recorded
input_fingerprint matches is loaded, not recomputed. Fingerprints are
content-derived (caller-supplied, e.g. corpus size + seed), never
wall-clock — reruns of the same input are byte-stable.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


class StageRunner:
    def __init__(self, spark: SparkSession, workdir: str | None, run_id: str = "run0",
                 input_fingerprint: str = ""):
        self.spark = spark
        self.workdir = workdir
        self.run_id = run_id
        self.fingerprint = input_fingerprint
        self.events: list[dict] = []  # in-memory log, inspected by tests
        self._persisted: list[DataFrame] = []  # cache handles for unpersist()

    def unpersist(self) -> None:
        """Release every cache this runner created (workdir=None mode
        persists MEMORY_AND_DISK and would otherwise accumulate blocks
        across repeated pipeline runs in one session — bench legs,
        notebooks). Call when the pipeline result has been consumed."""
        for df in self._persisted:
            df.unpersist()
        self._persisted.clear()

    # ------------------------------------------------------------------
    def _paths(self, stage: str) -> tuple[str, str]:
        assert self.workdir is not None
        return (
            os.path.join(self.workdir, stage),
            os.path.join(self.workdir, "_lineage", f"{stage}.json"),
        )

    def _completed(self, stage: str) -> bool:
        out, manifest = self._paths(stage)
        if not os.path.exists(os.path.join(out, "_SUCCESS")):
            return False
        if not os.path.exists(manifest):
            return False
        with open(manifest) as f:
            meta = json.load(f)
        return meta.get("input_fingerprint") == self.fingerprint

    # ------------------------------------------------------------------
    def stage(self, name: str, build, partition_by: str | None = None,
              persist: bool = True) -> DataFrame:
        """Run (or resume) one stage.

        ``build`` is a thunk returning the stage DataFrame. With no
        workdir the stage runs unmaterialized (pure lazy pipeline);
        ``persist`` marks stages with MULTIPLE downstream consumers
        (extraction feeds mentions+predicates, linked feeds
        components+nodes+edges) — single-consumer stages skip the cache
        write entirely.
        """
        if self.workdir is None:
            self.events.append({"stage": name, "action": "inline"})
            if not persist:
                return build()
            from pyspark import StorageLevel

            df = build().persist(StorageLevel.MEMORY_AND_DISK)
            self._persisted.append(df)
            return df

        out, manifest = self._paths(name)
        if self._completed(name):
            self.events.append({"stage": name, "action": "resumed"})
            return self.spark.read.parquet(out)

        t0 = time.monotonic()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(out)
        wall_ms = int((time.monotonic() - t0) * 1000)

        # per-partition (= per output file) lineage metrics
        reread = self.spark.read.parquet(out)
        per_file = (
            reread.groupBy(F.input_file_name().alias("file"))
            .count()
            .collect()
        )
        rows_out = sum(r["count"] for r in per_file)
        os.makedirs(os.path.dirname(manifest), exist_ok=True)
        meta = {
            "run_id": self.run_id,
            "stage": name,
            "input_fingerprint": self.fingerprint,
            "wall_ms": wall_ms,
            "rows_out": rows_out,
            "partitions": [
                {"file": os.path.basename(r["file"]), "rows": r["count"]} for r in per_file
            ],
        }
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1, sort_keys=True)
        os.replace(tmp, manifest)  # atomic: manifest present => stage complete
        self.events.append({"stage": name, "action": "computed", "rows_out": rows_out,
                            "wall_ms": wall_ms})
        return reread
