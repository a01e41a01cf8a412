"""Structured Streaming tests: the live watermarked pipelines must produce
exactly the batch-equivalent results (stream/batch parity), run under
Trigger.AvailableNow with a memory sink."""

from __future__ import annotations

import pyspark.sql.functions as F

from healthcare_data_warehouse_spark.sources.loaders import load_table
from healthcare_data_warehouse_spark.streaming.pipelines import (
    read_event_stream,
    run_stream_to_memory,
    streaming_dedup,
    streaming_tumbling_hourly,
    tumbling_hourly,
)

from conftest import SF_SMOKE


def _canon(rows):
    return sorted(
        (r["window_start"], r["event_type"], r["cnt"], r["total_value"]) for r in rows
    )


def test_stream_source_is_streaming(spark):
    assert read_event_stream(spark, SF_SMOKE).isStreaming


def test_tumbling_stream_matches_batch(spark):
    stream_result = run_stream_to_memory(
        streaming_tumbling_hourly(spark, SF_SMOKE), "t_tumbling"
    )
    batch_result = tumbling_hourly(load_table(spark, SF_SMOKE, "events"))
    assert _canon(stream_result.collect()) == _canon(batch_result.collect())


def test_streaming_dedup_matches_distinct(spark):
    stream_result = run_stream_to_memory(
        streaming_dedup(spark, SF_SMOKE), "t_dedup", output_mode="append"
    )
    n_stream = stream_result.count()
    n_batch = load_table(spark, SF_SMOKE, "events").select("event_id").distinct().count()
    assert n_stream == n_batch


def test_watermark_in_plan(spark):
    df = streaming_tumbling_hourly(spark, SF_SMOKE, watermark="2 hours")
    assert "EventTimeWatermark" in df._jdf.queryExecution().logical().toString()


def test_stream_static_enrich_matches_batch(spark):
    from healthcare_data_warehouse_spark.streaming.pipelines import (
        enrich_with_segment,
        streaming_enrich_segment,
    )

    stream_result = run_stream_to_memory(
        streaming_enrich_segment(spark, SF_SMOKE), "t_enrich"
    )
    batch_result = enrich_with_segment(
        load_table(spark, SF_SMOKE, "events"),
        load_table(spark, SF_SMOKE, "customer"),
    )
    canon = lambda rows: sorted(  # noqa: E731
        (r["window_start"], r["segment"], r["cnt"], r["total_value"]) for r in rows
    )
    assert canon(stream_result.collect()) == canon(batch_result.collect())


def test_stream_stream_funnel_matches_batch(spark):
    from healthcare_data_warehouse_spark.streaming.pipelines import (
        funnel_pairs,
        streaming_funnel_pairs,
    )

    stream_df = streaming_funnel_pairs(spark, SF_SMOKE)
    assert stream_df.isStreaming
    stream_result = run_stream_to_memory(stream_df, "t_funnel", output_mode="append")
    batch_result = funnel_pairs(load_table(spark, SF_SMOKE, "events"))
    canon = lambda rows: sorted(  # noqa: E731
        (r["user_id"], r["click_id"], r["purchase_id"]) for r in rows
    )
    assert canon(stream_result.collect()) == canon(batch_result.collect())
