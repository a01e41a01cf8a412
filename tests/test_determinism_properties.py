"""Property-based determinism tests (hypothesis).

The engine's oracle story rests on three claims:
1. ``dsum``/``davg`` are invariant under partitioning (decimal
   accumulation is exact, so combine order can't matter);
2. ``round2`` matches DuckDB's binary-double rounding bit-for-bit;
3. dense surrogate keys equal ROW_NUMBER regardless of partition count.

Hypothesis drives randomized inputs through all three; one Spark job per
example would be glacial, so each property samples batched inputs.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from healthcare_data_warehouse_spark.functions.expressions import dsum, round2

DOUBLES = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(DOUBLES, min_size=1, max_size=300), st.integers(1, 16))
def test_dsum_invariant_under_partitioning(spark, values, parts):
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    a = df.repartition(parts).agg(dsum("x").alias("s")).collect()[0]["s"]
    b = df.coalesce(1).agg(dsum("x").alias("s")).collect()[0]["s"]
    assert a == b  # bit equality, not approx


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(DOUBLES, min_size=1, max_size=200))
def test_round2_matches_duckdb_bitwise(spark, values):
    got = [
        r["r"]
        for r in spark.createDataFrame([(v,) for v in values], ["x"])
        .select(round2(F.col("x")).alias("r"))
        .collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute("SELECT floor(CAST(? AS DOUBLE) * 100 + 0.5) / 100", [v]).fetchone()[0]
        for v in values
    ]
    con.close()
    assert got == want


@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.sets(st.integers(0, 10**9), min_size=1, max_size=500), st.integers(1, 12))
def test_dense_keys_equal_row_number_any_partitioning(spark, keys, parts):
    from healthcare_data_warehouse_spark.operators.keys import add_dense_key

    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    keyed = add_dense_key(df, ["k"], key_col="sk", num_partitions=parts)
    got = [r["k"] for r in keyed.orderBy("sk").collect()]
    assert got == sorted(keys)
