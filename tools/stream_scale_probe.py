"""Streaming band-registry scale probe: drain time + state-store bytes.

    python tools/stream_scale_probe.py [sf_dir]

Runs the ingest-time SimHash band registry
(streaming/stateful_v2.streaming_simhash_band_registry) at the given
scale under the RocksDB state store (tws_session — the provider TWS
requires), drains it AvailableNow, and prints ONE JSON line with the
drain wall time, output registry size, and the per-batch stateOperators
evidence: numRowsTotal (distinct (band, value) keys held), state memory,
and the RocksDB custom metrics (SST file bytes on disk — the number
that must stay O(corpus bands), never O(stream volume)).

This is the round-6 scale-evidence tool for the registry: RUNBOOK holds
the sf10/sf30 rows it produced.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from healthcare_data_warehouse_spark.session import get_spark
    from healthcare_data_warehouse_spark.streaming.pipelines import (
        run_stream_to_memory,
    )
    from healthcare_data_warehouse_spark.streaming.stateful_v2 import (
        _PROVIDER_CONF,
        streaming_simhash_band_registry,
        tws_session,
    )

    spark = get_spark("stream-scale-probe")
    progress: list = []
    t0 = time.time()
    with tws_session(spark):
        provider = spark.conf.get(_PROVIDER_CONF)
        out = run_stream_to_memory(
            streaming_simhash_band_registry(spark, sf_dir),
            "probe_simhash_bands",
            output_mode="update",
            timeout_s=3600,
            progress_sink=progress,
        )
        n_rows = out.count()
    wall = time.time() - t0

    batches = []
    for p in progress:
        d = json.loads(p.json) if hasattr(p, "json") else p
        for so in d.get("stateOperators", []):
            cm = so.get("customMetrics", {})
            batches.append({
                "batch_id": d.get("batchId"),
                "input_rows": d.get("numInputRows"),
                "state_rows_total": so.get("numRowsTotal"),
                "state_memory_bytes": so.get("memoryUsedBytes"),
                "rocksdb_sst_bytes": cm.get("rocksdbSstFileSize"),
                "rocksdb_total_mem_bytes": cm.get("rocksdbTotalMemoryUsage"),
            })
    print(json.dumps({
        "probe": "stream_simhash_band_registry",
        "sf_dir": sf_dir,
        "provider": provider.rsplit(".", 1)[-1],
        "drain_wall_s": round(wall, 1),
        "registry_rows": n_rows,
        "n_batches": len(batches),
        "final_state_rows": batches[-1]["state_rows_total"] if batches else None,
        "final_state_memory_bytes":
            batches[-1]["state_memory_bytes"] if batches else None,
        "final_rocksdb_sst_bytes":
            batches[-1]["rocksdb_sst_bytes"] if batches else None,
        "batches": batches,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
