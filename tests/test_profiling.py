"""profile_table: one-pass column stats, exact vs HLL modes, plan shape."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from healthcare_data_warehouse_spark.operators.profiling import profile_table


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=1, b=None), Row(a=2, b="y"), Row(a=None, b="y")]
    )


def test_exact_profile_values(df):
    out = {r["col_name"]: r for r in profile_table(df).collect()}
    assert set(out) == {"a", "b"}
    a, b = out["a"], out["b"]
    assert a["n_rows"] == 4 and b["n_rows"] == 4
    assert a["n_nulls"] == 1 and b["n_nulls"] == 1
    assert a["n_distinct"] == 2 and b["n_distinct"] == 2  # nulls not counted
    assert (a["min_str"], a["max_str"]) == ("1", "2")
    assert (b["min_str"], b["max_str"]) == ("x", "y")


def test_approx_mode_close_and_expand_free(df):
    out = {r["col_name"]: r for r in profile_table(df, approx=True).collect()}
    # HLL++ is exact at this cardinality.
    assert out["a"]["n_distinct"] == 2 and out["b"]["n_distinct"] == 2
    # The scale guarantee: NEITHER mode plans an Expand — approx is a
    # single sketch pass, exact is a union of narrow per-column aggs
    # (4x faster than the multi-countDistinct Expand formulation).
    for mode in (True, False):
        plan = profile_table(df, approx=mode)._jdf.queryExecution().executedPlan().toString()
        assert "Expand" not in plan


def test_all_null_column_and_subset(spark):
    df = spark.createDataFrame([Row(a=1, b=None), Row(a=2, b=None)],
                               schema="a int, b string")
    out = {r["col_name"]: r for r in profile_table(df, ["b"]).collect()}
    assert list(out) == ["b"]
    assert out["b"]["n_nulls"] == 2 and out["b"]["n_distinct"] == 0
    assert out["b"]["min_str"] is None and out["b"]["max_str"] is None


def test_empty_columns_rejected(df):
    with pytest.raises(ValueError):
        profile_table(df, [])


def test_scan_shapes(spark, df):
    # Approx mode: ONE scan shared by every column's sketch.
    plan = profile_table(df, approx=True)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1
    # Exact mode over parquet: each union branch scans ONLY its column
    # (columnar pruning — N one-column reads, not N full-width scans).
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(d)
        pq = spark.read.parquet(d)
        plan = profile_table(pq, ["a"])._jdf.queryExecution().executedPlan().toString()
        assert "ReadSchema: struct<a:" in plan and "b:string" not in plan


def test_winsorize_clips_to_group_band(spark):
    from healthcare_data_warehouse_spark.operators.profiling import winsorize

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 101)] + [("b", 1000.0), ("b", 1.0), ("b", 2.0)],
        "g string, v double",
    )
    rows = winsorize(df, "v", group_col="g", lo_q=0.1, hi_q=0.9).collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r.g, []).append(r)
    a_vals = sorted(r.winsorized for r in by_g["a"])
    assert a_vals[0] >= 10.0 and a_vals[-1] <= 91.0   # clipped into band
    assert len(a_vals) == 100                          # row-preserving
    b_max = max(r.winsorized for r in by_g["b"])
    assert b_max < 1000.0                              # outlier clipped

    # ungrouped: global band
    g = winsorize(df.select("v"), "v", lo_q=0.0, hi_q=0.5).collect()
    assert max(r.winsorized for r in g) == sorted(x.v for x in df.collect())[51]
