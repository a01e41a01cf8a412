"""Warehouse maintenance: right-to-erasure propagation and compaction.

Neither exists in the reference (its README lists GDPR compliance as a
feature but implements only anonymization), yet both are table stakes for
an operated healthcare warehouse:

- ``forget_patients``: HIPAA/GDPR erasure — remove every row for a set of
  natural keys across the dimension and fact, as an anti-join rewrite
  (the deletion list broadcasts; each table is rewritten once, atomically).
  With a transactional format this is DELETE WHERE; the semantics and
  shuffle shape are identical.
- ``compact_table``: small-file compaction. Incremental loads accumulate
  files per partition; at 100 TB unmanaged small files destroy scan
  throughput (footer overhead, scheduler pressure). Rewrites each
  partition to ~target file counts, preserving partition columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sinks import overwrite_atomic, swap_into_place


def forget_patients(spark: SparkSession, warehouse_dir: str, patient_ids: list[int],
                    nk: str = "c_custkey") -> dict:
    """Erase all rows for the given natural keys from dim_customer and
    fact_orders under ``warehouse_dir``. Returns per-table removed counts."""
    ids = spark.createDataFrame([(int(i),) for i in patient_ids], f"{nk} long")
    removed: dict[str, int] = {}

    dim_path = os.path.join(warehouse_dir, "dim_customer")
    dim = spark.read.parquet(dim_path)
    kept_dim = dim.join(F.broadcast(ids), nk, "left_anti")
    removed["dim_customer"] = dim.count() - kept_dim.count()
    overwrite_atomic(kept_dim, dim_path)

    fact_path = os.path.join(warehouse_dir, "fact_orders")
    fact = spark.read.parquet(fact_path)
    kept_fact = fact.join(F.broadcast(ids.withColumnRenamed(nk, "o_custkey")),
                          "o_custkey", "left_anti")
    removed["fact_orders"] = fact.count() - kept_fact.count()
    # preserve the partitioning on rewrite
    tmp = fact_path + "__tmp"
    kept_fact.write.mode("overwrite").partitionBy("order_year").parquet(tmp)
    swap_into_place(tmp, fact_path)
    spark.catalog.refreshByPath(fact_path)
    return removed


def compact_table(spark: SparkSession, path: str, partition_col: str | None = None,
                  target_files_per_partition: int = 1) -> int:
    """Rewrite a parquet table with ~target files per partition.

    Returns the resulting parquet file count. Uses repartition on the
    partition column so each output task owns whole partitions."""
    df = spark.read.parquet(path)
    tmp = path + "__tmp"
    if partition_col:
        (df.repartition(target_files_per_partition, F.col(partition_col))
           .write.mode("overwrite").partitionBy(partition_col).parquet(tmp))
    else:
        df.coalesce(target_files_per_partition).write.mode("overwrite").parquet(tmp)
    swap_into_place(tmp, path)
    spark.catalog.refreshByPath(path)
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n
