"""Per-epoch metric aggregation (SURVEY.md A4).

The reference's training loop evaluates per validation micro-batch and
collects the metric dicts per epoch
(/root/reference/src/model/training.py:94-101: ``all_metrics.append``
over ``process_stream_file`` batches, printed per epoch). The engine
mapping is the declarative form of that collect: one shuffle keyed on
the epoch, map-side partial aggregation, avg/min/max/count per metric —
at 10^12 eval rows this is a plain hash aggregate whose output is
num_epochs rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def epoch_metric_summary(metrics: DataFrame, epoch_col: str = "epoch",
                         metric_col: str = "loss") -> DataFrame:
    """(epoch, n_batches, avg/min/max of the metric), ordered by epoch.

    ``metrics`` is one row per evaluation micro-batch, the distributed
    analogue of the reference's ``all_metrics`` list per epoch.
    """
    return (
        metrics.groupBy(F.col(epoch_col).alias("epoch"))
        .agg(
            F.count(F.lit(1)).alias("n_batches"),
            F.round(F.avg(metric_col), 6).alias("avg_metric"),
            F.round(F.min(metric_col), 6).alias("min_metric"),
            F.round(F.max(metric_col), 6).alias("max_metric"),
        )
        .orderBy("epoch")
    )
