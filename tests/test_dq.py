"""Declarative DQ rules engine: per-rule semantics, fusion, errors."""

import pytest
from pyspark.sql import Row

from healthcare_data_warehouse_spark.operators.dq import Rule, dq_check


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame([
        Row(id=1, status="A", score=5.0, code="X-1"),
        Row(id=2, status="B", score=25.0, code="Y-2"),   # score out of range
        Row(id=2, status="Z", score=3.0, code="bad"),    # dup id, bad status+code
        Row(id=None, status="A", score=None, code="X-9"),  # null id; null score OK
    ])


def _report(df, rules, refs=None):
    return {(r["rule"], r["col_name"]): r for r in
            dq_check(df, rules, refs).collect()}


def test_row_local_rules(df):
    rep = _report(df, [
        Rule("not_null", "id"),
        Rule("accepted_values", "status", ("A", "B")),
        Rule("in_range", "score", (0, 10)),
        Rule("matches", "code", r"^[XY]-[0-9]$"),
    ])
    assert rep[("not_null", "id")]["n_violations"] == 1
    assert rep[("accepted_values", "status")]["n_violations"] == 1
    assert rep[("in_range", "score")]["n_violations"] == 1  # NULL score passes
    assert rep[("matches", "code")]["n_violations"] == 1
    assert not rep[("matches", "code")]["passed"]


def test_unique_and_relationships(spark, df):
    ref = spark.createDataFrame([Row(k=1), Row(k=2)])
    rep = _report(df, [
        Rule("unique", "id"),
        Rule("relationships", "id", ("ref", "k")),
    ], {"ref": ref})
    assert rep[("unique", "id")]["n_violations"] == 2  # both rows of id=2
    assert rep[("relationships", "id")]["n_violations"] == 0  # nulls skip FK
    ref2 = spark.createDataFrame([Row(k=1)])
    rep2 = _report(df, [Rule("relationships", "id", ("ref", "k"))], {"ref": ref2})
    assert rep2[("relationships", "id")]["n_violations"] == 2


def test_all_green_table(spark):
    clean = spark.createDataFrame([Row(id=1, s="A"), Row(id=2, s="B")])
    rep = _report(clean, [Rule("not_null", "id"), Rule("unique", "id"),
                          Rule("accepted_values", "s", ("A", "B"))])
    assert all(r["passed"] for r in rep.values())


def test_row_local_rules_fuse_into_one_scan(df):
    out = dq_check(df, [Rule("not_null", "id"),
                        Rule("in_range", "score", (0, 10)),
                        Rule("matches", "code", "^X")])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1  # all three rules share one scan


def test_errors(df):
    with pytest.raises(ValueError):
        dq_check(df, [])
    with pytest.raises(ValueError):
        dq_check(df, [Rule("positively_vibing", "id")])
    with pytest.raises(ValueError):
        dq_check(df, [Rule("relationships", "id", ("missing", "k"))])
