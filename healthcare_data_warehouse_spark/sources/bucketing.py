"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the fact⋈fact and fact⋈big-dim joins dominate shuffle volume.
Writing both sides bucketed by the join key (`bucketBy(n, key)` +
`saveAsTable`) lets Spark plan a SortMergeJoin with NO Exchange on either
side — the bucket files are already hash-partitioned and sorted on disk.
This module materializes bucketed copies and proves the exchange-free
plan (pinned in tests/test_bucketing.py).

Reference analog: the B-tree FK indexes (init.sql:131-149) exist to
accelerate repeated key joins; bucketing is the columnar-warehouse
equivalent (SURVEY.md §4 "optional bucketing on patient_key").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 8,
                   sort: bool = True) -> None:
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def cobucketed_join(spark: SparkSession, left_table: str, right_table: str,
                    key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on the bucket key — planned with zero
    shuffle (no Exchange below the join in the physical plan)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
