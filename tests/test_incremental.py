"""Incremental aggregation: merge law, avg finalization, state size."""

import pytest
from pyspark.sql import functions as F

from healthcare_data_warehouse_spark.operators.incremental import (
    finalize,
    merge_states,
    partial_agg,
)


@pytest.fixture(scope="module")
def loads(spark):
    a = spark.createDataFrame(
        [("x", 1.0), ("x", 2.0), ("y", 10.0)], "k string, v double")
    b = spark.createDataFrame(
        [("x", 3.0), ("z", 5.0)], "k string, v double")
    return a, b


def test_merge_equals_whole(spark, loads):
    a, b = loads
    merged = finalize(merge_states(partial_agg(a, ["k"], "v"),
                                   partial_agg(b, ["k"], "v")))
    whole = finalize(partial_agg(a.unionByName(b), ["k"], "v"))
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_values(loads):
    a, b = loads
    out = {r["k"]: r for r in
           finalize(merge_states(partial_agg(a, ["k"], "v"),
                                 partial_agg(b, ["k"], "v"))).collect()}
    assert out["x"]["n"] == 3 and out["x"]["sum_v"] == 6.0
    assert out["x"]["avg_v"] == 2.0
    assert out["x"]["min_v"] == 1.0 and out["x"]["max_v"] == 3.0
    assert out["z"]["n"] == 1 and out["z"]["avg_v"] == 5.0


def test_single_state_identity(loads):
    a, _ = loads
    s = partial_agg(a, ["k"], "v")
    assert merge_states(s).exceptAll(s).count() == 0


def test_merge_shuffle_is_state_sized(loads):
    # The merge plan aggregates the unioned STATES — its inputs are the
    # two per-key aggregates, not the raw loads (raw rows appear only
    # below the partial aggs). Verify merge output row count is bounded
    # by the key domain, not the row count.
    a, b = loads
    merged = merge_states(partial_agg(a, ["k"], "v"), partial_agg(b, ["k"], "v"))
    assert merged.count() == 3  # |{x,y,z}| < 5 raw rows


def test_empty_merge_rejected():
    with pytest.raises(ValueError):
        merge_states()


def test_refresh_state_from_diff_equals_full_reaggregate(spark):
    from healthcare_data_warehouse_spark.operators.cdc import table_diff
    from healthcare_data_warehouse_spark.operators.incremental import (
        partial_agg,
        refresh_state_from_diff,
    )

    old = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0), (3, 7.0), (4, 1.0)],
        "k long, v double")
    # new state: key 2 updated, key 3 deleted, key 5 inserted, 1/4 untouched
    new = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 6.0), (4, 1.0), (5, 9.0)],
        "k long, v double")
    # row-identity diff needs a row key; use (k, v) as the compare surface
    diff = table_diff(
        old.groupBy("k").agg(F.sum("v").alias("v")),
        new.groupBy("k").agg(F.sum("v").alias("v")),
        ["k"],
    )
    refreshed = refresh_state_from_diff(
        partial_agg(old, ["k"], "v"), new, diff, ["k"], "v")
    full = partial_agg(new, ["k"], "v")
    assert sorted(map(tuple, refreshed.collect())) == sorted(map(tuple, full.collect()))
    # deleted key has no state row anymore
    assert refreshed.filter(F.col("k") == 3).count() == 0
