"""Data-quality constraint audit vs hand-counted dirty data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.operators.audit import check_constraints

ROWS = [
    # (id, code, score, email)
    (1, "A", 10.0, "a@x.com"),
    (2, "B", 55.0, "b@x.com"),
    (2, "A", -3.0, "nope"),        # dup id, score below range, bad email
    (None, "C", 120.0, None),      # null id, code off-list, score above
    (4, None, None, "d@x.com"),    # null code/score: skipped by value rules
    (5, "A", 99.9, "e@x.com"),
]
RULES = [
    {"id": "id_nn", "type": "not_null", "column": "id"},
    {"id": "id_uq", "type": "unique", "column": "id"},
    {"id": "code_vals", "type": "accepted_values", "column": "code",
     "values": ["A", "B"]},
    {"id": "score_rng", "type": "range", "column": "score",
     "min": 0.0, "max": 100.0},
    {"id": "email_re", "type": "regex", "column": "email",
     "pattern": "^[a-z]+@[a-z]+\\.com$"},
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, ["id", "code", "score", "email"])


def _res(out):
    return {
        r.rule_id: (r.rule_type, r.column_name, r.n_checked, r.n_violations,
                    r.passed)
        for r in out.collect()
    }


def test_row_local_and_unique(spark, df):
    got = _res(check_constraints(df, RULES))
    assert got == {
        # 6 rows, 1 null id
        "id_nn": ("not_null", "id", 6, 1, False),
        # 5 non-null ids, 4 distinct -> 1 surplus
        "id_uq": ("unique", "id", 5, 1, False),
        # 5 non-null codes, 'C' off-list
        "code_vals": ("accepted_values", "code", 5, 1, False),
        # 5 non-null scores, -3 and 120 out of range
        "score_rng": ("range", "score", 5, 2, False),
        # 5 non-null emails, 'nope' fails
        "email_re": ("regex", "email", 5, 1, False),
    }


def test_ref_rule(spark, df):
    ref = spark.createDataFrame([(1,), (2,), (4,)], ["k"])
    rules = [{"id": "fk", "type": "ref", "column": "id",
              "ref_table": "dim", "ref_column": "k"}]
    got = _res(check_constraints(df, rules, {"dim": ref}))
    # non-null ids: 1,2,2,4,5 -> 5 checked; id 5 missing -> 1 violation
    assert got == {"fk": ("ref", "id", 5, 1, False)}


def test_all_clean_passes(spark):
    df = spark.createDataFrame([(1, "A"), (2, "B")], ["id", "code"])
    got = _res(check_constraints(df, [
        {"id": "nn", "type": "not_null", "column": "id"},
        {"id": "uq", "type": "unique", "column": "id"},
        {"id": "av", "type": "accepted_values", "column": "code",
         "values": ["A", "B"]},
    ]))
    assert all(v[4] is True and v[3] == 0 for v in got.values())


def test_empty_frame(spark, df):
    got = _res(check_constraints(df.where(F.lit(False)), RULES))
    assert all(v[2] == 0 and v[3] == 0 and v[4] is True for v in got.values())


def test_validation_errors(spark, df):
    with pytest.raises(ValueError, match="duplicate rule ids"):
        check_constraints(df, [RULES[0], RULES[0]])
    with pytest.raises(ValueError, match="unknown rule type"):
        check_constraints(df, [{"id": "x", "type": "nope", "column": "id"}])
    with pytest.raises(ValueError, match="ref_tables"):
        check_constraints(df, [{"id": "x", "type": "ref", "column": "id",
                                "ref_table": "missing", "ref_column": "k"}])


def test_single_scan_plan(spark, df):
    """All row-local + unique rules must fold into one aggregation over
    one scan — the plan may contain exactly one pair of HashAggregates
    (partial + final) and no Python."""
    out = check_constraints(df, RULES)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    # one partial+final agg pair over a single scan feeding the explode
    assert plan.count("Scan ExistingRDD") <= 1


def test_empty_rules_rejected(spark, df):
    with pytest.raises(ValueError, match="non-empty"):
        check_constraints(df, [])
