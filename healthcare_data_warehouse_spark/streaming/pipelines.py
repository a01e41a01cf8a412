"""Structured Streaming pipelines over the events table.

The reference is strictly batch (SURVEY.md §2.9) — its "incremental" story
is Airflow-scheduled idempotent upserts. This module is the Spark-native
streaming slice sanctioned by BASELINE.json north_star: file-source
streams with watermarks, tumbling/sliding/session windows, and
watermark-bounded dedup, all runnable as ``Trigger.AvailableNow``
micro-batch jobs (the modern replacement for the reference's hourly cron
ETL, airflow_dags.py:58-78).

Every streaming aggregation has a batch-equivalent builder used both by
the query catalog (DuckDB-oracle-checked) and by tests that assert the
stream output equals the batch output on the same data — the
batch/stream parity contract Structured Streaming is designed around.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.expressions import dsum

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    # The file-source stream handles the table's nanosecond parquet
    # timestamps natively, truncating to NTZ micros — unlike the batch
    # reader, it IGNORES spark.sql.legacy.parquet.nanosAsLong, so a
    # LongType pin here would silently yield micros-as-long (off by
    # 1000 from the batch path's nanos-as-long).
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_event_stream(spark: SparkSession, sf_dir: str,
                      path_glob: str = "events.parquet",
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over the events parquet (schema pinned — a
    streaming source can't infer). At scale this is the same code over a
    cloud-storage path with maxFilesPerTrigger tuned — which is exactly
    what ``max_files_per_trigger`` exposes (AvailableNow honors it, so a
    multi-file input drains as a genuine MULTI-BATCH incremental run:
    the shape tools/stream_scale_probe.py measures state growth on).
    ``path_glob`` widens the single-file driver layout to staged
    multi-file tables (documents-000.parquet …)."""
    # File-source streams take a directory; the glob narrows it to the
    # events table (a single-file "table" in the driver layout).
    reader = spark.readStream.schema(EVENT_SCHEMA) \
        .option("pathGlobFilter", path_glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(sf_dir)
    # NTZ → LTZ cast: watermarks require tz-aware event time
    # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise). The session TZ is
    # pinned to UTC (session.tune_session), so the cast is an exact
    # epoch-preserving identity on the wall clock and the window bounds
    # downstream convert back to NTZ losslessly for batch/oracle parity.
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


# ---------------------------------------------------------------------------
# Window aggregations — batch builders (shared by catalog + stream parity)
# ---------------------------------------------------------------------------


def tumbling_hourly(events: DataFrame) -> DataFrame:
    """Tumbling 1h window x event_type: count + exact-decimal value sum."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "total_value")
    )


def sliding_hourly(events: DataFrame) -> DataFrame:
    """Sliding 1h window, 30m slide: every event lands in two windows."""
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session count + event count using native session windows
    (gap-merge semantics: a new session starts when the inter-event gap
    is >= the gap duration)."""
    sessions = (
        events.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count("*").alias("events_in_session"))
    )
    return sessions.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("events_in_session").alias("n_events"),
    )


def dedup_keep_first(events: DataFrame) -> DataFrame:
    """First event per (user_id, event_type) — the deterministic batch
    equivalent of streaming dropDuplicates (which keeps the first arrival;
    batch needs an explicit total order to mean anything)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_type", "event_id")
    )


def enrich_with_segment(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Hourly event rollup per customer market segment: events joined to
    the customer dimension (user_id = c_custkey in the driver layout).
    In streaming this is a STREAM-STATIC join — the static side is
    re-resolved every micro-batch, so dimension updates between batches
    are picked up; join strategy is left to Catalyst/AQE (customer scales
    with the data — no broadcast hint, per the engine-wide hint policy)."""
    dim = customer.select(F.col("c_custkey").alias("user_id"),
                          F.col("c_mktsegment").alias("segment"))
    return (
        events.join(dim, "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "segment")
        .agg(F.count("*").alias("cnt"), dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "segment", "cnt", "total_value")
    )


def funnel_pairs(events: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """Click→purchase conversion pairs: every (click, purchase) by the
    same user with the purchase inside ``horizon`` after the click. The
    batch twin of the streaming stream-stream interval join: equi-key on
    user_id (one co-shuffle) plus a time-range predicate — never a cross
    join."""
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        )
        .select("user_id", "click_id", "purchase_id")
    )


# ---------------------------------------------------------------------------
# Streaming runners (Trigger.AvailableNow + memory sink)
# ---------------------------------------------------------------------------


def run_stream_to_memory(stream_df: DataFrame, query_name: str,
                         output_mode: str = "complete", timeout_s: int = 120,
                         progress_sink: list | None = None) -> DataFrame:
    """Execute a streaming plan with AvailableNow and return the result
    as a DataFrame from the in-memory sink (test/dev harness; production
    sinks are parquet/Kafka via the same writeStream).

    Raises TimeoutError if the drain doesn't finish inside ``timeout_s``
    — an AvailableNow run is bounded by its input, so "not done yet" is
    either an undersized timeout for the data scale (pass a bigger one)
    or a hung query. Returning the sink anyway would hand back a
    partial/EMPTY result that reads as a normal DataFrame (observed:
    the simhash band registry at sf10 returned 0 rows because the batch
    outran the default cap) — silent wrong answers are worse than a
    loud stop.

    ``progress_sink``: pass a list to receive the drained query's
    recentProgress dicts — the stateOperators rows carry the state-store
    evidence (numRowsTotal, stateMemory, RocksDB customMetrics) the
    scale probes record."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_s)
    if progress_sink is not None:
        progress_sink.extend(p for p in q.recentProgress if p)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"streaming drain '{query_name}' still running after "
            f"{timeout_s}s; the AvailableNow batch has not caught up — "
            "raise timeout_s for this data scale (the sink would "
            "otherwise be returned incomplete)."
        )
    return stream_df.sparkSession.table(query_name)


def streaming_tumbling_hourly(spark: SparkSession, sf_dir: str,
                              watermark: str = "2 hours") -> DataFrame:
    """The real streaming pipeline: watermarked tumbling aggregation.
    The watermark bounds state: windows older than max(event time) -
    watermark are finalized and evicted — the knob that makes unbounded
    streams run in bounded memory at scale."""
    ev = read_event_stream(spark, sf_dir).withWatermark("ts", watermark)
    return tumbling_hourly(ev).withColumn(
        "window_start", F.col("window_start").cast("timestamp_ntz")
    )


def streaming_enrich_segment(spark: SparkSession, sf_dir: str,
                             watermark: str = "2 hours") -> DataFrame:
    """Stream-static enrichment: the event stream joins the (batch)
    customer dimension, then aggregates per segment per hour under a
    watermark. The static side is just a DataFrame — Structured Streaming
    re-binds it each micro-batch."""
    from ..sources.loaders import load_table

    ev = read_event_stream(spark, sf_dir).withWatermark("ts", watermark)
    dim = load_table(spark, sf_dir, "customer")
    return enrich_with_segment(ev, dim).withColumn(
        "window_start", F.col("window_start").cast("timestamp_ntz")
    )


def streaming_funnel_pairs(spark: SparkSession, sf_dir: str,
                           horizon: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """STREAM-STREAM interval join: clicks and purchases are two
    watermarked streams; the time-range predicate on the join condition
    lets Spark bound each side's state (click state can be dropped once
    the watermark passes click_ts + horizon). Append output — each pair
    is emitted exactly once."""
    ev = read_event_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user_id"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", watermark)
    )
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        )
        .select("user_id", "click_id", "purchase_id")
    )


def streaming_dedup(spark: SparkSession, sf_dir: str,
                    watermark: str = "1 hour") -> DataFrame:
    """Watermark-bounded streaming dedup on event_id: state for ids older
    than the watermark is dropped (the late-duplicate horizon)."""
    ev = read_event_stream(spark, sf_dir).withWatermark("ts", watermark)
    return ev.dropDuplicates(["event_id"]).select("event_id", "user_id", "event_type")


def trending_topk(hourly: DataFrame, k: int = 3) -> DataFrame:
    """Rank event types inside each tumbling window and keep the top k
    (deterministic tiebreak on event_type). Shared by the batch twin and
    the foreachBatch stage of the streaming variant; the window is
    partitioned by window_start, so the sort is per-hour, never global."""
    w = Window.partitionBy("window_start").orderBy(
        F.col("cnt").desc(), F.col("event_type"))
    return (
        hourly.select("window_start", "event_type", "cnt",
                      F.rank().over(w).cast("int").alias("rnk"))
        .filter(F.col("rnk") <= k)
    )


def streaming_trending_topk(spark: SparkSession, sf_dir: str, out_path: str,
                            k: int = 3, watermark: str = "2 hours") -> DataFrame:
    """Streaming trending-topics: watermarked tumbling counts, then a
    foreachBatch ranking stage — rank() isn't allowed on a live streaming
    aggregate (it would need the finished window), so each micro-batch
    re-ranks the aggregate snapshot and overwrites the serving table.
    That overwrite-a-small-ranked-table shape is the production pattern
    for leaderboards: state lives in the (watermark-bounded) agg, the
    sink is tiny and idempotently rewritten."""
    ev = read_event_stream(spark, sf_dir).withWatermark("ts", watermark)
    agg = tumbling_hourly(ev).withColumn(
        "window_start", F.col("window_start").cast("timestamp_ntz"))

    def _rank_and_swap(batch_df: DataFrame, _batch_id: int) -> None:
        trending_topk(batch_df, k).write.mode("overwrite").parquet(out_path)

    q = (
        agg.writeStream.foreachBatch(_rank_and_swap)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_path)


def funnel_outcomes(events: DataFrame, horizon: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Batch twin of the streaming LEFT OUTER interval join: every
    converted (click, purchase) pair, PLUS a null-padded row for each
    unconverted click whose join state the stream's final watermark
    would have expired.

    The cutoff reproduces Structured Streaming's outer-join emission
    rule: the global watermark is min over both inputs of max(event
    time) minus the delay, and a click's null row may emit only once no
    future purchase could still match it — click_ts + horizon below
    that watermark. Clicks newer than the cutoff are unresolved
    in-flight state in the stream, so the batch twin must exclude them
    to compare equal (pinned by tests/test_streaming.py)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"))
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"))
    wm = events.agg(
        F.least(
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
            F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
        ).alias("__max_ts")
    ).select((F.col("__max_ts") - F.expr(f"INTERVAL {watermark}")).alias("__wm"))
    j = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        "left_outer",
    )
    return (
        j.crossJoin(F.broadcast(wm))  # 1-row scalar: bounded
        .filter(
            F.col("purchase_id").isNotNull()
            | (F.col("click_ts") + F.expr(f"INTERVAL {horizon}") < F.col("__wm"))
        )
        .select(
            "user_id", "click_id", "purchase_id",
            F.col("purchase_id").isNotNull().alias("converted"),
        )
    )


def streaming_funnel_outcomes(spark: SparkSession, sf_dir: str,
                              horizon: str = "1 hour",
                              watermark: str = "2 hours") -> DataFrame:
    """STREAM-STREAM LEFT OUTER interval join — the conversion-OUTCOME
    stream (inner pairs tell you who converted; the null side is the
    abandonment signal remarketing actually wants). Outer state differs
    from the inner join's: a click row can only emit its null once the
    watermark proves no matching purchase can still arrive (click_ts +
    horizon below the global watermark), so unmatched rows emit with
    watermark latency — the price of exactly-once null emission."""
    ev = read_event_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user_id"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", watermark)
    )
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
            "left_outer",
        )
        .select(
            "user_id", "click_id", "purchase_id",
            F.col("purchase_id").isNotNull().alias("converted"),
        )
    )
