"""Declarative data-quality constraint audit (Deequ / dbt-test shape).

The registry half of the reference is CRUD over curated task/model rows
(/root/reference/src/utils/crud.py); what production pipelines bolt on
top of any such table — and what a 100 TB ingest boundary cannot live
without — is a declarative constraint audit: assert the invariants,
measure the violations, gate the batch. This module re-expresses the
public shape of AWS Deequ ("Unit tests for data" — Schelter et al.,
VLDB 2018) and dbt's schema tests as pure DataFrame algebra.

Rule vocabulary (one result row per rule):

  * ``not_null``        — column has no NULLs;
  * ``unique``          — column values are distinct (NULLs ignored,
                          like dbt's unique test);
  * ``accepted_values`` — non-NULL values belong to a fixed list;
  * ``range``           — non-NULL values lie in [min, max];
  * ``regex``           — non-NULL values match an anchored pattern
                          (RE2-safe subset: no lookaround, works
                          identically in Spark and DuckDB);
  * ``ref``             — non-NULL values exist in a reference table's
                          key column (foreign-key / blocklist check).

Result: ``(rule_id, rule_type, column_name, n_checked, n_violations,
passed)``. ``n_checked`` is the population the rule quantifies over
(all rows for not_null; non-NULL rows otherwise), so
``n_violations / n_checked`` is a meaningful failure rate.

Scale shape — the reason this is an operator and not a loop of counts:
every row-local rule (not_null / accepted_values / range / regex) and
every ``unique`` rule folds into ONE aggregation pass over the fact
table — k rules cost one scan, with partial (map-side) aggregation and
zero shuffled rows beyond the single global-agg exchange; uniqueness
rides the same pass as count(col) - count(distinct col). Only ``ref``
rules add work: one left-anti join each against the (usually
dimension-sized, hence broadcast) reference keys. Nothing here is ever
per-row Python; the result reshape is an in-row explode of a constant-
width struct array.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, functions as F

_ROW_LOCAL = ("not_null", "accepted_values", "range", "regex")


def _violation_indicator(rule: Mapping) -> "F.Column":
    c = F.col(rule["column"])
    t = rule["type"]
    if t == "accepted_values":
        return (c.isNotNull() & ~c.isin(list(rule["values"]))).cast("long")
    if t == "range":
        bad = (c < F.lit(rule["min"])) | (c > F.lit(rule["max"]))
        return (c.isNotNull() & bad).cast("long")
    if t == "regex":
        return (c.isNotNull() & ~c.rlike(rule["pattern"])).cast("long")
    raise ValueError(f"not a row-local rule type: {t}")


def check_constraints(
    df: DataFrame,
    rules: Sequence[Mapping],
    ref_tables: Mapping[str, DataFrame] | None = None,
) -> DataFrame:
    """Audit ``df`` against ``rules``; see module docstring for the rule
    vocabulary and result schema.

    Each rule is a mapping with at least ``id``, ``type``, ``column``;
    plus ``values`` (accepted_values), ``min``/``max`` (range),
    ``pattern`` (regex), or ``ref_table``/``ref_column`` (ref, resolved
    via ``ref_tables``). Rule ids must be unique.
    """
    rules = list(rules)
    ids = [r["id"] for r in rules]
    if len(set(ids)) != len(ids):
        raise ValueError(f"duplicate rule ids: {ids}")
    known = _ROW_LOCAL + ("unique", "ref")
    for r in rules:
        if r["type"] not in known:
            raise ValueError(f"unknown rule type: {r['type']!r}")

    # ---- one aggregation pass for everything except ref ----------------
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for r in rules:
        rid = r["id"]
        c = F.col(r["column"])
        if r["type"] == "not_null":
            aggs.append(F.count(c).alias(f"_nn_{rid}"))
        elif r["type"] == "unique":
            aggs.append(F.count(c).alias(f"_nn_{rid}"))
            aggs.append(F.countDistinct(c).alias(f"_nd_{rid}"))
        elif r["type"] in _ROW_LOCAL:
            aggs.append(F.count(c).alias(f"_nn_{rid}"))
            aggs.append(F.sum(_violation_indicator(r)).alias(f"_viol_{rid}"))
    agg = df.agg(*aggs)

    entries = []
    for r in rules:
        rid, t = r["id"], r["type"]
        if t == "ref":
            continue
        if t == "not_null":
            checked = F.col("_n_rows")
            viol = F.col("_n_rows") - F.col(f"_nn_{rid}")
        elif t == "unique":
            checked = F.col(f"_nn_{rid}")
            viol = F.col(f"_nn_{rid}") - F.col(f"_nd_{rid}")
        else:
            checked = F.col(f"_nn_{rid}")
            # sum() is NULL over an empty/all-null frame
            viol = F.coalesce(F.col(f"_viol_{rid}"), F.lit(0))
        entries.append(
            F.struct(
                F.lit(rid).alias("rule_id"),
                F.lit(t).alias("rule_type"),
                F.lit(r["column"]).alias("column_name"),
                checked.cast("long").alias("n_checked"),
                viol.cast("long").alias("n_violations"),
            )
        )

    parts = []
    if entries:
        parts.append(
            agg.select(F.explode(F.array(*entries)).alias("e")).select("e.*")
        )

    # ---- ref rules: one anti-join each ---------------------------------
    for r in rules:
        if r["type"] != "ref":
            continue
        if ref_tables is None or r["ref_table"] not in ref_tables:
            raise ValueError(f"ref rule {r['id']!r} needs ref_tables[{r['ref_table']!r}]")
        ref = ref_tables[r["ref_table"]].select(
            F.col(r["ref_column"]).alias("_k")
        ).distinct()
        fact = df.select(F.col(r["column"]).alias("_k")).where(
            F.col("_k").isNotNull()
        )
        counts = fact.join(ref, "_k", "left_anti").agg(
            F.count(F.lit(1)).alias("_viol")
        )
        checked = fact.agg(F.count(F.lit(1)).alias("_chk"))
        parts.append(
            counts.crossJoin(checked).select(
                F.lit(r["id"]).alias("rule_id"),
                F.lit("ref").alias("rule_type"),
                F.lit(r["column"]).alias("column_name"),
                F.col("_chk").cast("long").alias("n_checked"),
                F.col("_viol").cast("long").alias("n_violations"),
            )
        )

    if not parts:
        raise ValueError("rules must be non-empty")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.withColumn("passed", F.col("n_violations") == 0)
