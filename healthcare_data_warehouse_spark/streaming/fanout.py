"""Multi-sink streaming fan-out: one source drain feeding N sinks.

The Kafka-consumer-shaped topology every event platform ends up with —
archive the raw stream, maintain serving aggregates, and route alerts —
expressed as ONE checkpointed query: the micro-batch is materialized once
(persist) and each sink writes from the cached batch, so the source is
read once per batch no matter how many sinks hang off it. Three separate
queries would re-read and re-checkpoint the source three times and could
drift (one sink ahead of another after a partial failure); one
foreachBatch keeps every sink at the same offset frontier.

Exactly-once across crashes WITHOUT sink transactions: every sink write
is an idempotent per-batch partition overwrite (``.../batch_id=N``
replaced wholesale on retry). Structured Streaming's contract is that a
replayed batch has the same batch_id and the same input rows, so a crash
between sinks re-runs the whole batch and each directory converges to
identical content — the same recipe Delta's ``txnAppId``/``txnVersion``
automates. The aggregate sink stores mergeable PARTIALS per batch
(sum/count, never avg), combined at read time: retrying a batch replaces
its partial instead of double-counting it.

At 100 TB this exact code runs against a Kafka source with a rate limit
per trigger; the per-batch-partition layout also gives the archive a
natural retention boundary (drop old batch_id directories).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.expressions import dsum

HIGH_VALUE_ALERT = 500.0


def run_event_fanout(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    alert_threshold: float = HIGH_VALUE_ALERT,
    timeout_s: int = 180,
    path_glob: str | None = None,
) -> int:
    """Drain pending event files once into three sinks; returns the number
    of non-empty micro-batches. Sinks (all under ``dest_dir``):

    - ``raw/``            full archive, partitioned by batch_id
    - ``agg_partials/``   per-(user_id, event_type) sum/count partials per
                          batch — read via :func:`read_user_totals`
    - ``alerts/``         events with value above ``alert_threshold``
    """
    reader = spark.readStream.schema(schema)
    if path_glob is not None:
        reader = reader.option("pathGlobFilter", path_glob)
    stream = reader.parquet(src_dir)
    raw = os.path.join(dest_dir, "raw")
    agg = os.path.join(dest_dir, "agg_partials")
    alerts = os.path.join(dest_dir, "alerts")

    def _fan(batch: DataFrame, batch_id: int) -> None:
        b = batch.persist()
        try:
            b.write.mode("overwrite").parquet(f"{raw}/batch_id={batch_id}")
            (
                b.groupBy("user_id", "event_type")
                .agg(F.count("*").alias("cnt"),
                     F.sum(F.col("value").cast("decimal(18,4)")).alias("value_sum"))
                .write.mode("overwrite")
                .parquet(f"{agg}/batch_id={batch_id}")
            )
            (
                b.filter(F.col("value") > alert_threshold)
                .write.mode("overwrite")
                .parquet(f"{alerts}/batch_id={batch_id}")
            )
        finally:
            b.unpersist()

    q = (
        stream.writeStream.foreachBatch(_fan)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        # Still running: readers would see half-written sinks. Fail loudly
        # instead of returning with silently-partial results.
        q.stop()
        raise TimeoutError(
            f"fan-out drain did not finish within {timeout_s}s; sinks under "
            f"{dest_dir} are incomplete")
    # recentProgress is capped by spark.sql.streaming.numRecentProgressUpdates
    # (default 100), so this counts OBSERVED non-empty micro-batches — a
    # lower bound for drains beyond the retention window. Callers branch on
    # zero/non-zero, which the bound preserves (the most recent entries are
    # the ones retained).
    return sum(1 for p in q.recentProgress if p["numInputRows"] > 0)


def read_user_totals(spark: SparkSession, dest_dir: str) -> DataFrame:
    """Serving view over the aggregate sink: merge the per-batch partials
    (sums of sums, sums of counts — the mergeable-aggregate discipline)
    into per-(user, event_type) totals."""
    partials = spark.read.parquet(os.path.join(dest_dir, "agg_partials"))
    return (
        partials.groupBy("user_id", "event_type")
        .agg(F.sum("cnt").alias("total_events"),
             F.sum("value_sum").cast("double").alias("total_value"))
    )


def batch_user_totals(events: DataFrame) -> DataFrame:
    """Batch twin of :func:`read_user_totals` for parity tests."""
    return (
        events.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("total_events"),
             dsum("value").alias("total_value"))
    )
