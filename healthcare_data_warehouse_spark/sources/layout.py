"""Z-order (Morton-code) data layout for multi-dimensional data skipping.

Why: parquet readers prune row groups / files with min-max statistics. A
sort on ONE column gives perfect pruning on that column and none on any
other; interleaving the bits of several columns' ranks (the Z-order curve
— the layout strategy behind Delta/Iceberg ``OPTIMIZE ZORDER BY``) makes
every file cover a compact hyper-rectangle, so selective filters on ANY
of the curve columns skip most files. At 100 TB the difference between
"scan 2 of 10 000 files" and "scan all of them" IS the query time.

Construction, all native expressions:

1. per column: equi-width bucketize to ``bits``-bit ints using the
   column's (min, max) — ONE tiny stats agg for all columns, two scalars
   per column to the driver (bounded);
2. interleave the bucket bits round-robin into a single long (shift/or
   chain — whole-stage codegen, no UDF);
3. ``repartitionByRange`` on the curve value (range partitioner keeps
   curve-adjacent rows in the same output file) + ``sortWithinPartitions``
   so row groups inside each file are curve-contiguous too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_Z = "__zorder"


def _bucketize(col: str, lo: float, hi: float, bits: int) -> Column:
    """Equi-width rank of ``col`` into [0, 2^bits) as a long."""
    n = (1 << bits) - 1
    if hi == lo:  # constant column → everything in bucket 0
        return F.lit(0).cast("long")
    scaled = (F.col(col).cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    return F.least(F.greatest(F.floor(scaled * n), F.lit(0)), F.lit(n)).cast("long")


def zorder_value(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """The Morton interleave of ``cols`` (per-column equi-width ranks).

    ``len(cols) * bits`` must fit a long (≤ 63). Column stats come from
    one aggregate job over ``df``.
    """
    if not cols or len(cols) * bits > 63:
        raise ValueError("zorder: need 1+ columns with len(cols)*bits <= 63")
    stats = df.agg(*[f(c) for c in cols for f in (F.min, F.max)]).first()
    buckets = [
        _bucketize(c, float(stats[2 * i]), float(stats[2 * i + 1]), bits)
        for i, c in enumerate(cols)
    ]
    z = F.lit(0).cast("long")
    for bit in range(bits):          # round-robin bit interleave
        for i, b in enumerate(buckets):
            pos = bit * len(buckets) + i
            z = z.bitwiseOR(F.shiftleft(F.shiftright(b, bit).bitwiseAND(F.lit(1)),
                                        pos))
    return z


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int | None = None, bits: int = 16) -> None:
    """Write ``df`` to parquet laid out along the Z-curve of ``cols``."""
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.withColumn(_Z, zorder_value(df, cols, bits))
        .repartitionByRange(n, _Z)
        .sortWithinPartitions(_Z)
        .drop(_Z)
        .write.mode("overwrite").parquet(path)
    )


def file_span_stats(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file (min, max) span of each layout column, normalized by the
    global span — the data-skipping quality metric (mean span ≈ fraction
    of files a random point-filter must read)."""
    df = spark.read.parquet(path).withColumn("__file", F.input_file_name())
    per_file = df.groupBy("__file").agg(
        *[f(c).alias(f"{t}_{c}") for c in cols for t, f in
          (("min", F.min), ("max", F.max))]
    )
    glob = df.agg(
        *[f(c).alias(f"g{t}_{c}") for c in cols for t, f in
          (("min", F.min), ("max", F.max))]
    )
    out = per_file.crossJoin(F.broadcast(glob))
    for c in cols:
        out = out.withColumn(
            f"span_{c}",
            (F.col(f"max_{c}") - F.col(f"min_{c}"))
            / (F.col(f"gmax_{c}") - F.col(f"gmin_{c}")),
        )
    return out.select("__file", *[f"span_{c}" for c in cols])
