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

RUNTIME BOOTSTRAP: Spark's TWS Python worker speaks a protobuf
state-server protocol to the JVM (``pyspark.sql.streaming.proto``),
unlike v1's Arrow-only path — so ``google.protobuf`` must import in the
driver and in every worker. When site-packages has it, nothing special
happens; when it doesn't (this container), ``ensure_tws_runtime``
bootstraps the vendored pure-Python runtime (``_vendor/README.md``):
zipimport on the driver, ``addPyFile`` for the workers. TWS also
requires the RocksDB state store provider (multiple column families —
one per named state variable — which HDFSBackedStateStoreProvider
rejects); ``tws_session`` scopes that conf around query start.

Scale shape: state lives in the RocksDB state store partitioned by
user_id, and the per-key footprint is a 3-field tuple plus a k-capped
list — growth is O(cardinality × k), independent of stream volume.
``total_value`` is carried as EXACT integer 1e-4 micro-units (the same
discipline as stateful.py and the decimal-exact batch aggregates): the
int64 sum is associative, so the drained result is independent of
micro-batch boundaries and hash-matches a one-shot batch oracle. TTL on
the value state (RocksDB-side, no timer bookkeeping in user code) is
the idle-key eviction story at 100 TB-scale cardinalities.
"""

from __future__ import annotations

import contextlib
import os
import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .stateful import BURST_N, HIGH_VALUE

_VENDOR_PB_ZIP = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "_vendor",
                 "protobuf_py_4_23_2.zip")
)


def _bootstrap_protobuf() -> tuple[bool, bool]:
    """Make ``google.protobuf`` importable; returns (available, vendored)."""
    try:
        import google.protobuf  # noqa: F401

        return True, False
    except ImportError:
        pass
    if not os.path.exists(_VENDOR_PB_ZIP):
        return False, False
    if _VENDOR_PB_ZIP not in sys.path:
        sys.path.insert(0, _VENDOR_PB_ZIP)
    # local-mode Python workers inherit the driver env at JVM launch;
    # cluster workers get the zip via addPyFile in ensure_tws_runtime.
    prev = os.environ.get("PYTHONPATH", "")
    if _VENDOR_PB_ZIP not in prev.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _VENDOR_PB_ZIP + ((os.pathsep + prev) if prev else "")
        )
    try:
        import google.protobuf  # noqa: F401

        return True, True
    except ImportError:
        return False, False


HAS_TWS_RUNTIME, USES_VENDORED_PROTOBUF = _bootstrap_protobuf()

# import AFTER the bootstrap: stateful_processor pulls in the pb2 modules
if HAS_TWS_RUNTIME:
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
else:  # pragma: no cover - container always has the vendored zip
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = object  # type: ignore[assignment,misc]

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
_PYFILE_SENT: set[str] = set()  # applicationIds already given the zip

OUTPUT_SCHEMA_V2 = (
    "user_id long, total_events long, total_value double, bursts long, "
    "recent_n int, deviation boolean"
)

RECENT_K = 8
DEVIATION_FACTOR = 3.0


def ensure_tws_runtime(spark: SparkSession) -> None:
    """Distribute the vendored protobuf zip to every Python worker that
    will speak the TWS protocol. No-op when site-packages already
    provides protobuf.

    Two channels, both needed:
    - ``sc.environment["PYTHONPATH"]``: captured into each subsequently
      created PythonFunction's envVars and merged into the spawned
      worker's PYTHONPATH by the JVM — the ONLY channel that reaches the
      TWS *driver* worker (``transform_with_state_driver_worker``, used
      for state-schema validation), which reads no python-includes and
      whose default path is pyspark.zip + py4j + the spark-core jar.
      (The jar is the trap: its ``google/protobuf/*.proto`` resource
      dirs make ``google.protobuf`` resolve as an EMPTY namespace
      package, so without this the worker dies with "cannot import name
      'descriptor' ... (unknown location)".) Must run BEFORE the plan
      is built so the UDF captures it.
    - ``addPyFile``: covers executor-side workers on a real cluster,
      where the driver-local zip path doesn't exist on remote hosts.
    """
    if not USES_VENDORED_PROTOBUF:
        return
    sc = spark.sparkContext
    prev = sc.environment.get("PYTHONPATH", "")
    if _VENDOR_PB_ZIP not in prev.split(os.pathsep):
        sc.environment["PYTHONPATH"] = (
            _VENDOR_PB_ZIP + ((os.pathsep + prev) if prev else "")
        )
    if sc.applicationId not in _PYFILE_SENT:
        sc.addPyFile(_VENDOR_PB_ZIP)
        _PYFILE_SENT.add(sc.applicationId)


@contextlib.contextmanager
def tws_session(spark: SparkSession):
    """Scope the RocksDB state-store provider (required by TWS: one column
    family per named state variable) around a query start, restoring the
    session's previous provider afterwards."""
    ensure_tws_runtime(spark)
    prev = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, ROCKSDB_PROVIDER)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, prev)


class UserProfileProcessor(StatefulProcessor):
    """Per-user running profile + bounded recent-value window.

    ValueState ``profile`` carries (total_events, micro_value, bursts) —
    identical semantics to stateful.py's v1 fold (micro_value is the
    int64 1e-4 micro-unit running sum), so drained outputs are
    comparable one-for-one and batch-boundary invariant. ListState
    ``recent`` keeps the last RECENT_K values; ``deviation`` is true
    when this batch's max value exceeds DEVIATION_FACTOR x the mean of
    the retained window (a cheap streaming outlier flag that needs
    exactly the state v1 can't hold without packing everything into one
    tuple)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._profile = handle.getValueState(
            "profile", "total_events long, micro_value long, bursts long"
        )
        self._recent = handle.getListState("recent", "value double")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        import numpy as np

        (user_id,) = key
        prev = self._profile.get()
        total_events, micro_value, bursts = prev if prev is not None else (0, 0, 0)

        batch_vals: list[float] = []
        for pdf in rows:
            total_events += len(pdf)
            # floor(v·1e4 + 0.5): the repo-wide half-up micro-unit round —
            # pure IEEE arithmetic, replayed verbatim by the DuckDB oracle.
            v = pdf["value"].to_numpy(dtype=np.float64)
            micro_value += int(np.floor(v * 10000.0 + 0.5).astype(np.int64).sum())
            if int((pdf["value"] > HIGH_VALUE).sum()) >= BURST_N:
                bursts += 1
            batch_vals.extend(float(x) for x in v)

        window = [v for (v,) in self._recent.get()] if self._recent.exists() else []
        deviation = bool(
            window
            and batch_vals
            and max(batch_vals) > DEVIATION_FACTOR * (sum(window) / len(window))
        )
        window = (window + batch_vals)[-RECENT_K:]

        self._profile.update((total_events, micro_value, bursts))
        self._recent.put([(v,) for v in window])
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "total_events": [total_events],
                "total_value": [micro_value / 10000.0],
                "bursts": [bursts],
                "recent_n": [len(window)],
                "deviation": [deviation],
            }
        )

    def close(self) -> None:
        pass


def streaming_user_profiles_v2(spark: SparkSession, sf_dir: str,
                               path_glob: str = "events.parquet",
                               max_files_per_trigger: int | None = None,
                               ) -> DataFrame:
    """Watermarked stream → v2 stateful per-user profile updates.

    The returned plan is unstarted; start it under ``tws_session(spark)``
    so the RocksDB provider (and, when vendored, the worker-side protobuf
    zip) is in place at query start. ``path_glob`` /
    ``max_files_per_trigger`` pass through to the file source for the
    multi-batch scale probes (tools/stream_scale_probe.py)."""
    from .pipelines import read_event_stream

    ensure_tws_runtime(spark)
    ev = read_event_stream(
        spark, sf_dir, path_glob=path_glob,
        max_files_per_trigger=max_files_per_trigger,
    ).withWatermark("ts", "2 hours")
    return ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA_V2,
        outputMode="update",
        timeMode="none",
    )


# ---------------------------------------------------------------------------
# Streaming near-duplicate detection at ingest: SimHash band registry.
#
# The corpus × streaming intersection a training-data pipeline runs in
# production: documents arrive as a stream, and each doc's 48-bit SimHash
# splits into 4 × 12-bit bands (the pigeonhole decomposition of
# dedup.simhash_near_pairs — any pair within hamming ≤ 3 shares at least
# one band exactly). Keyed by (band_idx, band_value), the processor keeps
# the running (first_doc_id = min, doc_count) per band — BOTH associative,
# so the drained registry is independent of micro-batch boundaries and
# arrival order, and hash-matches a one-shot batch oracle (stream ≡ batch,
# driver-checkable). A new doc is a near-dup candidate iff any of its
# bands already has first_doc_id < doc_id — derivable from the registry
# with one batch join, no second stateful operator in the stream.
#
# Scale shape: state is one (long, long) tuple per DISTINCT band value —
# O(corpus bands), RocksDB-backed, never proportional to stream volume.
# ---------------------------------------------------------------------------

BAND_REGISTRY_SCHEMA = (
    "band_idx int, band_value long, first_doc_id long, doc_count long"
)


class SimhashBandRegistryProcessor(StatefulProcessor):
    """Running (min doc_id, count) per (band_idx, band_value)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._band = handle.getValueState(
            "band", "first_doc_id long, doc_count long")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        band_idx, band_value = key
        prev = self._band.get()
        first, count = prev if prev is not None else (None, 0)
        for pdf in rows:
            ids = pdf["doc_id"]
            m = int(ids.min())
            first = m if first is None else min(first, m)
            count += len(ids)
        self._band.update((first, count))
        yield pd.DataFrame({
            "band_idx": [band_idx],
            "band_value": [band_value],
            "first_doc_id": [first],
            "doc_count": [count],
        })

    def close(self) -> None:
        pass


def streaming_simhash_band_registry(spark: SparkSession, sf_dir: str,
                                    bits: int = 48,
                                    band_bits: int = 12,
                                    path_glob: str = "documents.parquet",
                                    max_files_per_trigger: int | None = None,
                                    ) -> DataFrame:
    """Document stream → banded SimHash → per-band running registry.
    Returned plan is unstarted; start under ``tws_session(spark)``.
    ``path_glob`` / ``max_files_per_trigger`` pass through to the file
    source for the multi-batch scale probes."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..operators.dedup import simhash_signatures_arrow

    ensure_tws_runtime(spark)
    doc_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    reader = spark.readStream.schema(doc_schema) \
        .option("pathGlobFilter", path_glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    docs = reader.parquet(sf_dir)
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    # Arrow signature pass, not the per-doc expression: bit-identical
    # values (pytest-pinned vs simhash64) at hashlib speed — the
    # expression path interprets bits x tokens HOF steps per doc and
    # took MINUTES per 100k docs, silently starving the drain timeout.
    sig = simhash_signatures_arrow(docs, "text", "doc_id", bits=bits) \
        .withColumnRenamed("simhash", "__sig")
    banded = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.shiftright("__sig", band_bits * i)
                .bitwiseAND(F.lit(mask)).alias("band_value"),
            ) for i in range(n_bands)
        ])).alias("__b"),
    ).select("doc_id", "__b.band_idx", "__b.band_value")
    return banded.groupBy("band_idx", "band_value").transformWithStateInPandas(
        statefulProcessor=SimhashBandRegistryProcessor(),
        outputStructType=BAND_REGISTRY_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
