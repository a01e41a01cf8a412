"""Cross-validate the applyInPandas grouped-map fit against the native
closed-form twin (operators.grouped)."""

from __future__ import annotations

import pyspark.sql.functions as F

from healthcare_data_warehouse_spark.operators.grouped import (
    trend_slope_native,
    trend_slope_pandas,
)
from healthcare_data_warehouse_spark.sources.loaders import load_table

from conftest import SF_SMOKE


def test_pandas_and_native_slopes_agree(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    native = {r["o_custkey"]: r["cost_trend_slope"]
              for r in trend_slope_native(o, "o_custkey", "o_orderdate", "o_totalprice").collect()}
    pand = {r["customer_id"]: r["cost_trend_slope"]
            for r in trend_slope_pandas(o, "o_custkey", "o_orderdate", "o_totalprice").collect()}
    assert set(native) == set(pand)
    for k, v in native.items():
        if v is None:
            assert pand[k] is None
        else:
            # numpy mean-centered formula vs decimal closed form: same
            # statistic, different fp path — agree to float tolerance
            assert abs(pand[k] - v) <= 1e-6 * max(1.0, abs(v))


def test_degenerate_groups_are_null(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-01", 5.0), (2, "2024-01-01", 9.0)],
        "k long, d string, y double",
    ).select("k", F.col("d").cast("date").alias("d"), "y")
    out = {r["k"]: r["cost_trend_slope"]
           for r in trend_slope_native(df, "k", "d", "y").collect()}
    assert out[1] is None  # single point
    assert out[2] is None  # zero x-variance
