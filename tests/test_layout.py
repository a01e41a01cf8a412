"""Z-order layout: interleave correctness + data-skipping quality."""

import pytest
from pyspark.sql import functions as F

from healthcare_data_warehouse_spark.sources.layout import (
    file_span_stats,
    write_zordered,
    zorder_value,
)


def test_interleave_locality(spark):
    # Curve neighbors must be spatial neighbors: for a 4x4 grid the
    # Morton order is the textbook N-shaped curve.
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x int, y int")
    out = df.withColumn("z", zorder_value(df, ["x", "y"], bits=2)).collect()
    z = {(r["x"], r["y"]): r["z"] for r in out}
    assert z[(0, 0)] == 0
    assert len(set(z.values())) == 16          # bijective on the grid
    # (0,0),(1,0),(0,1),(1,1) occupy the first curve quadrant.
    first_quad = sorted(z[p] for p in [(0, 0), (1, 0), (0, 1), (1, 1)])
    assert first_quad == [0, 1, 2, 3]


def test_validation(spark):
    df = spark.createDataFrame([(1, 2)], "x int, y int")
    with pytest.raises(ValueError):
        zorder_value(df, [], bits=16)
    with pytest.raises(ValueError):
        zorder_value(df, ["x", "y"], bits=32)  # 64 bits > long


def test_constant_column_ok(spark):
    df = spark.createDataFrame([(1, 7), (2, 7)], "x int, y int")
    vals = [r[0] for r in df.select(zorder_value(df, ["x", "y"])).collect()]
    assert len(vals) == 2  # no div-by-zero on zero span


def test_zorder_beats_single_sort_on_second_dim(spark, tmp_path):
    # 64k points on a 256x256 grid. Sorting by x alone leaves every file
    # spanning ~all of y; z-order gives compact rectangles in BOTH dims.
    df = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"),
        F.floor(F.col("id") / 256).alias("y"),
    )
    z_path, s_path = str(tmp_path / "zorder"), str(tmp_path / "xsort")
    write_zordered(df, z_path, ["x", "y"], n_files=16)
    df.repartitionByRange(16, "x").sortWithinPartitions("x") \
        .write.mode("overwrite").parquet(s_path)

    def mean_span(path, col):
        rows = file_span_stats(spark, path, ["x", "y"]).collect()
        return sum(r[f"span_{col}"] for r in rows) / len(rows)

    zx, zy = mean_span(z_path, "x"), mean_span(z_path, "y")
    sx, sy = mean_span(s_path, "x"), mean_span(s_path, "y")
    assert sy > 0.9          # x-sort: files span ~all of y
    assert zy < 0.5 * sy     # z-order: y-span collapses...
    assert zx < 0.6          # ...while x-span stays far from full
