"""Multi-sink streaming fan-out: one drain, three sinks, exactly-once."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F
from pyspark.sql import types as T

from healthcare_data_warehouse_spark.streaming.fanout import (
    batch_user_totals,
    read_user_totals,
    run_event_fanout,
)

SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def _write(src, name, rows):
    pq.write_table(
        pa.table({
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([r[3] for r in rows], type=pa.float64()),
        }),
        str(src / name))


def test_fanout_three_sinks_incremental_and_idempotent(spark, tmp_path):
    src = tmp_path / "src"
    dest = str(tmp_path / "dest")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    _write(src, "a.parquet", [
        (1, 10, "click", 5.0), (2, 10, "purchase", 900.0), (3, 11, "click", 7.5),
    ])
    assert run_event_fanout(spark, str(src), dest, ckpt, SCHEMA) >= 1

    # raw archive holds everything; alerts only the >500 event
    assert spark.read.parquet(os.path.join(dest, "raw")).count() == 3
    alerts = spark.read.parquet(os.path.join(dest, "alerts")).collect()
    assert [r["event_id"] for r in alerts] == [2]

    # Second incarnation drains ONLY the new file (checkpointed offsets).
    _write(src, "b.parquet", [(4, 10, "click", 2.5), (5, 12, "purchase", 501.0)])
    run_event_fanout(spark, str(src), dest, ckpt, SCHEMA)
    assert spark.read.parquet(os.path.join(dest, "raw")).count() == 5
    assert spark.read.parquet(os.path.join(dest, "alerts")).count() == 2

    # Merged serving totals equal the batch twin over the full event set.
    all_events = spark.read.parquet(os.path.join(dest, "raw")).drop("batch_id")
    got = {tuple(r) for r in read_user_totals(spark, dest).collect()}
    want = {tuple(r) for r in batch_user_totals(all_events).collect()}
    assert got == want and len(got) >= 4

    # Nothing new → no batch, nothing changes in any sink.
    assert run_event_fanout(spark, str(src), dest, ckpt, SCHEMA) == 0
    assert spark.read.parquet(os.path.join(dest, "raw")).count() == 5

    # Crash-retry idempotency: re-running a batch's sink writes (same
    # batch_id, same rows — Structured Streaming's replay contract)
    # converges instead of double-counting, because every sink is a
    # per-batch partition overwrite. Simulate by rewriting batch 0's
    # partials directly.
    batch0 = spark.read.parquet(os.path.join(dest, "raw")).filter(
        F.col("batch_id") == 0).drop("batch_id")
    (batch0.groupBy("user_id", "event_type")
     .agg(F.count("*").alias("cnt"),
          F.sum(F.col("value").cast("decimal(18,4)")).alias("value_sum"))
     .write.mode("overwrite")
     .parquet(os.path.join(dest, "agg_partials", "batch_id=0")))
    again = {tuple(r) for r in read_user_totals(spark, dest).collect()}
    assert again == want
