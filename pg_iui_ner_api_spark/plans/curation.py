"""Training-data curation pipeline: quality-filter → fuzzy dedup →
PII scrub + deterministic splits, as resumable lineage stages.

The KG pipeline (plans/pipeline.py) is the reference-semantics product;
this is its training-data twin — the corpus-preparation flow a 100 TB
pretraining pipeline runs BEFORE any model sees the data — built from
the already-oracle-checked operators (functions/text.py quality/PII/
split columns, operators/dedup.fuzzy_dedup) on the same StageRunner
(plans/lineage.py), so mid-corpus resume, per-partition lineage
metrics, and bucketed stage materialization all carry over unchanged.

Stage shapes at scale:
  * ``filtered`` — map-only column algebra (quality score, token count,
    language gate) fused into the scan; bucketed by doc_id.
  * ``keepers`` — fuzzy_dedup's (doc_id, cluster_id, keep) map; the
    shuffle is over LSH band buckets + the id-only cluster join, never
    document text; bucketed by doc_id so the keeper join back to
    ``filtered`` is Exchange-free.
  * ``curated`` — map-only scrub + split assignment, partitioned by
    split so downstream training jobs prune to their own split.

Provenance: the reference curates nothing (uploads go straight to
training, /root/reference/src/routers/main_endpoints.py:84-101);
curation semantics are engine-side new work per the task brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import (
    dataset_split,
    pii_counts,
    quality_score,
    scrub_pii,
    token_count,
)
from ..operators.dedup import fuzzy_dedup
from .lineage import StageRunner


def run_curation_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    workdir: str | None = None,
    input_fingerprint: str = "",
    quality_min: float = 0.3,
    langs: list[str] | None = None,
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float | None = None,
    train: float = 0.90,
    dev: float = 0.05,
    n_buckets: int = 64,
) -> dict:
    """docs(doc_id, text, lang, ...) -> curated corpus + stage handles.

    Returns {"filtered", "keepers", "curated", "_runner"}; ``curated``
    rows carry scrubbed text, quality/token stats, PII hit counts, the
    dedup cluster id, and the split assignment. Rows dropped by the
    quality gate or dedup are absent (their counts are recoverable from
    the lineage manifests' per-stage rows_out — no silent loss).
    """
    runner = StageRunner(
        spark, workdir, input_fingerprint=input_fingerprint
    )

    def _filtered() -> DataFrame:
        d = docs.withColumn("quality", quality_score(F.col("text"))).withColumn(
            "n_tokens", token_count(F.col("text"))
        )
        if langs is not None:
            d = d.where(F.col("lang").isin(list(langs)))
        return d.where(F.col("quality") >= quality_min)

    filtered = runner.stage(
        "filtered", _filtered, bucket_by="doc_id" if workdir else None,
        n_buckets=n_buckets, persist=True,
    )

    keepers = runner.stage(
        "keepers",
        lambda: fuzzy_dedup(
            filtered, num_hashes=num_hashes, bands=bands,
            threshold=jaccard_threshold,
        ),
        bucket_by="doc_id" if workdir else None,
        n_buckets=n_buckets, persist=True,
    )

    def _curated() -> DataFrame:
        kept = keepers.where(F.col("keep")).select("doc_id", "cluster_id")
        urls, emails, phones = pii_counts(F.col("text"))
        return (
            filtered.join(kept, "doc_id")
            # counts FIRST (they read the raw text), scrub after
            .withColumn("n_emails", emails)
            .withColumn("n_urls", urls)
            .withColumn("n_phones", phones)
            .withColumn("text", scrub_pii(F.col("text")))
            .withColumn("split", dataset_split(F.col("doc_id"), train, dev))
        )

    curated = runner.stage(
        "curated", _curated, partition_by="split", persist=False
    )
    return {
        "filtered": filtered,
        "keepers": keepers,
        "curated": curated,
        "_runner": runner,
    }
