"""transformWithStateInPandas (state API v2) operator tests.

The engine integration needs google.protobuf (Spark's TWS worker
protocol); stateful_v2 bootstraps the vendored pure-Python runtime when
site-packages lacks it (_vendor/README.md), so the live-stream parity
test runs for real in this container — skipif survives only as a guard
for an environment with neither. The processor's fold logic is pure
pandas and is additionally pinned against fake state handles: profile
parity with the v1 batch-twin semantics, the bounded ListState window,
and the deviation flag — including the cross-batch state-carry behavior
the real state store provides.
"""

from __future__ import annotations

import pandas as pd
import pytest

from healthcare_data_warehouse_spark.streaming.stateful_v2 import (
    DEVIATION_FACTOR,
    HAS_TWS_RUNTIME,
    RECENT_K,
    UserProfileProcessor,
)


class FakeValueState:
    def __init__(self):
        self._v = None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class FakeListState:
    def __init__(self):
        self._rows = []

    def exists(self):
        return bool(self._rows)

    def get(self):
        return iter(self._rows)

    def put(self, rows):
        self._rows = list(rows)


class FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeValueState())

    def getListState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeListState())


def _drive(proc, handle, key, batches):
    """Feed one micro-batch (list of pandas frames) through the processor."""
    out = list(proc.handleInputRows(key, iter(batches), timerValues=None))
    assert len(out) == 1
    return out[0].iloc[0]


def test_profile_fold_and_burst_semantics():
    proc = UserProfileProcessor()
    handle = FakeHandle()
    proc.init(handle)

    # batch 1: two modest events — no burst, no deviation (empty window)
    r1 = _drive(proc, handle, (7,), [pd.DataFrame({"value": [10.0, 10.0]})])
    assert (r1["total_events"], r1["total_value"], r1["bursts"]) == (2, 20.0, 0)
    assert r1["deviation"] == False and r1["recent_n"] == 2  # noqa: E712

    # batch 2: 3 events above HIGH_VALUE in one batch -> burst increments;
    # max 200 > DEVIATION_FACTOR * mean(recovered window [10,10]) -> flag
    r2 = _drive(proc, handle, (7,),
                [pd.DataFrame({"value": [200.0, 160.0, 151.0]})])
    assert (r2["total_events"], r2["bursts"]) == (5, 1)
    assert abs(r2["total_value"] - 531.0) < 1e-9
    assert r2["deviation"] == True and r2["recent_n"] == 5  # noqa: E712
    assert 200.0 > DEVIATION_FACTOR * 10.0  # the invariant the flag used


def test_recent_window_is_bounded():
    proc = UserProfileProcessor()
    handle = FakeHandle()
    proc.init(handle)
    for i in range(4):
        row = _drive(proc, handle, (1,),
                     [pd.DataFrame({"value": [float(i)] * 5})])
    assert row["recent_n"] == RECENT_K  # 20 values seen, window capped
    kept = [v for (v,) in handle.states["recent"]._rows]
    assert kept == [2.0, 3.0, 3.0, 3.0, 3.0, 3.0][-RECENT_K:] or len(kept) == RECENT_K


def test_state_carries_across_incarnations_like_recovery():
    """Simulate checkpoint recovery: a NEW processor instance over the
    SAME state handles must continue the fold (this is exactly what the
    state store guarantees the processor across query restarts)."""
    handle = FakeHandle()
    p1 = UserProfileProcessor()
    p1.init(handle)
    _drive(p1, handle, (7,), [pd.DataFrame({"value": [10.0, 10.0]})])

    p2 = UserProfileProcessor()  # fresh incarnation, recovered state
    p2.init(handle)
    r = _drive(p2, handle, (7,), [pd.DataFrame({"value": [100.0]})])
    assert r["total_events"] == 3 and abs(r["total_value"] - 120.0) < 1e-9
    assert r["deviation"] == True  # vs the recovered window mean 10.0  # noqa: E712


@pytest.mark.skipif(not HAS_TWS_RUNTIME,
                    reason="google.protobuf absent and no vendored runtime")
def test_v2_stream_matches_v1_and_batch(spark):
    from conftest import SF_SMOKE
    from healthcare_data_warehouse_spark.sources.loaders import load_table
    from healthcare_data_warehouse_spark.streaming.pipelines import (
        run_stream_to_memory,
    )
    from healthcare_data_warehouse_spark.streaming.stateful import (
        batch_user_profiles,
    )
    from healthcare_data_warehouse_spark.streaming.stateful_v2 import (
        streaming_user_profiles_v2,
        tws_session,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    with tws_session(spark):
        out = run_stream_to_memory(
            streaming_user_profiles_v2(spark, SF_SMOKE), "v2_profiles_t",
            output_mode="update")
    w = Window.partitionBy("user_id").orderBy(F.desc("total_events"))
    latest = (out.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn"))
    key = lambda r: (r["user_id"], r["total_events"], round(r["total_value"], 4))
    batch = batch_user_profiles(load_table(spark, SF_SMOKE, "events"))
    assert {key(r) for r in latest.collect()} == {key(r) for r in batch.collect()}


def test_simhash_band_registry_drives_near_dup_verdicts(spark):
    """The streaming band registry supports the ingest-dedup decision
    with ONE batch join: a doc is a near-dup candidate iff any of its
    bands has first_doc_id < doc_id — and the candidate set is a
    SUPERSET of the true hamming<=3 pairs' later docs (pigeonhole:
    recall is structural, precision is what the exact re-check buys)."""
    from pyspark.sql import functions as F

    from conftest import SF_SMOKE
    from healthcare_data_warehouse_spark.operators.dedup import (
        simhash_signatures_df)
    from healthcare_data_warehouse_spark.plans.catalog import queries
    from healthcare_data_warehouse_spark.sources.loaders import load_table

    reg = queries()["stream_simhash_band_registry"](spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents")

    # derive each doc's bands in batch and join to the drained registry
    sig = simhash_signatures_df(docs)
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band_idx"),
                     F.shiftright("simhash", 12 * i)
                     .bitwiseAND(F.lit(4095)).alias("band_value"))
            for i in range(4)
        ])).alias("b"),
    ).select("doc_id", "b.band_idx", "b.band_value")
    verdicts = (
        bands.join(reg, ["band_idx", "band_value"])
        .groupBy("doc_id")
        .agg(F.min("first_doc_id").alias("earliest_band_owner"))
        .withColumn("near_dup_candidate",
                    F.col("earliest_band_owner") < F.col("doc_id"))
    )
    got = {r["doc_id"]: r["near_dup_candidate"] for r in verdicts.collect()}
    assert len(got) == docs.count()  # every doc gets a verdict

    # structural recall: every true hamming<=3 later-doc is a candidate
    true_pairs = queries()["dedup_simhash_near"](spark, SF_SMOKE).collect()
    for r in true_pairs:
        later = max(r["id_a"], r["id_b"])
        assert got[later], (r["id_a"], r["id_b"])


def test_registry_runs_on_rocksdb_state_store_with_metrics(spark):
    """The RocksDB config path, end to end: tws_session must scope the
    RocksDB provider around the drain (and restore the previous conf),
    and the drained query's stateOperators progress must report the
    registry's state living in RocksDB — numRowsTotal == distinct
    (band, value) keys and nonzero SST bytes on disk. This is the
    contract the scale probes (tools/stream_scale_probe.py, RUNBOOK
    sf10/sf30 rows) rely on."""
    from conftest import SF_SMOKE
    from healthcare_data_warehouse_spark.streaming.pipelines import (
        run_stream_to_memory,
    )
    from healthcare_data_warehouse_spark.streaming.stateful_v2 import (
        _PROVIDER_CONF,
        ROCKSDB_PROVIDER,
        streaming_simhash_band_registry,
        tws_session,
    )

    prev = spark.conf.get(_PROVIDER_CONF, None)
    progress: list = []
    with tws_session(spark):
        assert spark.conf.get(_PROVIDER_CONF) == ROCKSDB_PROVIDER
        out = run_stream_to_memory(
            streaming_simhash_band_registry(spark, SF_SMOKE),
            "rocksdb_cfg_probe",
            output_mode="update",
            timeout_s=600,
            progress_sink=progress,
        )
        n = out.select("band_idx", "band_value").distinct().count()
    assert spark.conf.get(_PROVIDER_CONF, None) == prev  # restored
    assert n > 0 and progress
    import json as _json

    state_ops = []
    for p in progress:
        d = _json.loads(p.json) if hasattr(p, "json") else p
        state_ops.extend(d.get("stateOperators", []))
    assert state_ops
    final = state_ops[-1]
    assert final["numRowsTotal"] == n
    sst = final.get("customMetrics", {}).get("rocksdbSstFileSize", 0)
    assert sst > 0  # state genuinely materialized in RocksDB SSTs
