"""Tests for as-of and interval-range joins (operators.temporal)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from healthcare_data_warehouse_spark.operators.temporal import asof_join, range_join_count


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute, 0)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(30), 101), (2, _ts(5), 200)],
        ["user_id", "ts", "event_id"],
    )
    right = spark.createDataFrame(
        [(1, _ts(8)), (1, _ts(10)), (1, _ts(25)), (2, _ts(7))], ["user_id", "ts"]
    )
    out = {r["event_id"]: r["matched_ts"] for r in
           asof_join(left, right, on="user_id").collect()}
    assert out[100] == _ts(10)   # simultaneous right row matches (as-of convention)
    assert out[101] == _ts(25)
    assert out[200] is None      # only later right rows exist → no match


def test_range_join_count(spark):
    left = spark.createDataFrame([(1, _ts(30), 900)], ["user_id", "ts", "event_id"])
    right = spark.createDataFrame(
        [(1, _ts(21)), (1, _ts(25)), (1, _ts(30)), (1, _ts(19)), (2, _ts(29))],
        ["user_id", "ts"],
    )
    out = range_join_count(left, right, on="user_id", ts_col="ts",
                           lookback="10 MINUTES").collect()
    # window is [20:00, 30:00): 21 and 25 count; 30 (equal) and 19 (too old)
    # and user 2 don't.
    assert out[0]["matches"] == 2


def test_grouped_ewma_matches_closed_form(spark):
    from healthcare_data_warehouse_spark.operators.temporal import grouped_ewma

    rows = [("g", i, float(v)) for i, v in enumerate([10, 20, 30, 40])]
    rows += [("solo", 0, 99.0)]
    df = spark.createDataFrame(rows, "g string, seq int, v double")
    out = {r.g: r for r in grouped_ewma(df, "v", ["seq"], "g", alpha=0.5, beta=0.5).collect()}
    # s1=10, s2=15, s3=22.5, s4=31.25
    assert out["g"].ewma == 31.25 and out["g"].n_points == 4
    assert out["solo"].ewma == 99.0 and out["solo"].n_points == 1
    # order column, not input order, drives the fold
    shuffled = spark.createDataFrame(list(reversed(rows)), "g string, seq int, v double")
    out2 = {r.g: r.ewma for r in grouped_ewma(shuffled, "v", ["seq"], "g", alpha=0.5, beta=0.5).collect()}
    assert out2["g"] == 31.25
