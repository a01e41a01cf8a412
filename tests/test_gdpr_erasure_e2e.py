"""End-to-end GDPR/HIPAA right-to-erasure over snapshot-versioned tables.

The individual pieces (forget_patients anti-join rewrite, snapshot
time-travel, vacuum retention) are unit-tested elsewhere; this is the full
compliance loop the README sells: snapshots make history READABLE, which
means erasure is not complete until vacuum has destroyed every pre-erasure
version. The test proves, file-system-level, that after
erase-commit + vacuum the forgotten patient is absent from every byte
still on disk — current pointer, every remaining version, and the raw
parquet files themselves — while unrelated history semantics (audit log
of the erase commit, surviving rows) stay intact.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from healthcare_data_warehouse_spark.sources.loaders import load_table
from healthcare_data_warehouse_spark.sources.snapshots import (
    latest_version,
    snapshot_history,
    snapshot_read,
    snapshot_vacuum,
    snapshot_write,
)

from conftest import SF_SMOKE


def _erase(spark, path: str, key_col: str, ids: list[int]) -> int:
    """The erasure commit: anti-join rewrite as a NEW immutable version
    (DELETE WHERE semantics over the snapshot protocol)."""
    ids_df = spark.createDataFrame([(int(i),) for i in ids], f"{key_col} long")
    kept = snapshot_read(spark, path).join(F.broadcast(ids_df), key_col, "left_anti")
    return snapshot_write(kept, path, op="gdpr_erase")


def test_erased_patient_absent_from_all_snapshots_after_vacuum(spark, tmp_path):
    dim_path = str(tmp_path / "dim_customer")
    fact_path = str(tmp_path / "fact_orders")

    customer = load_table(spark, SF_SMOKE, "customer")
    orders = load_table(spark, SF_SMOKE, "orders")

    # v1: initial load; v2: a later incremental load (history accumulates).
    snapshot_write(customer, dim_path, op="initial")
    snapshot_write(orders, fact_path, op="initial")
    snapshot_write(
        customer.withColumn("c_comment", F.lit("restated")), dim_path, op="restate")
    snapshot_write(orders, fact_path, op="reload")

    # A patient who exists in both tables at every committed version.
    victim = int(
        orders.groupBy("o_custkey").count().orderBy(F.desc("count")).first()[0])
    assert snapshot_read(spark, dim_path, 1).filter(
        F.col("c_custkey") == victim).count() == 1
    n_victim_orders = snapshot_read(spark, fact_path, 2).filter(
        F.col("o_custkey") == victim).count()
    assert n_victim_orders > 0

    # Erasure commit. History is immutable, so the PRE-erasure versions
    # still serve the patient — readable history is exactly why vacuum is
    # a required step of the compliance loop, not an optimization.
    _erase(spark, dim_path, "c_custkey", [victim])
    _erase(spark, fact_path, "o_custkey", [victim])
    assert snapshot_read(spark, dim_path).filter(
        F.col("c_custkey") == victim).count() == 0
    assert snapshot_read(spark, fact_path, 1).filter(
        F.col("o_custkey") == victim).count() == n_victim_orders

    # Vacuum down to the erased version only.
    removed_dim = snapshot_vacuum(dim_path, keep_last=1)
    removed_fact = snapshot_vacuum(fact_path, keep_last=1)
    assert removed_dim == [1, 2] and removed_fact == [1, 2]

    for path, key in ((dim_path, "c_custkey"), (fact_path, "o_custkey")):
        # Only the erased version remains committed and readable …
        history = snapshot_history(path)
        assert [h["version"] for h in history] == [3]
        assert history[0]["op"] == "gdpr_erase"
        assert latest_version(path) == 3
        # … and it contains nothing for the victim.
        assert snapshot_read(spark, path).filter(
            F.col(key) == victim).count() == 0
        # Time travel to any pre-erasure version must FAIL, not serve PHI.
        for old in (1, 2):
            with pytest.raises(FileNotFoundError):
                snapshot_read(spark, path, old)

    # File-system ground truth: no parquet file under either table still
    # holds a row for the victim (reading every remaining file directly,
    # bypassing the snapshot pointer entirely).
    for path, key in ((dim_path, "c_custkey"), (fact_path, "o_custkey")):
        files = [
            os.path.join(root, f)
            for root, _dirs, fs in os.walk(path)
            for f in fs if f.endswith(".parquet")
        ]
        assert files, "vacuum must not have destroyed the live version"
        leftover = (
            spark.read.parquet(*files).filter(F.col(key) == victim).count())
        assert leftover == 0

    # Collateral check: everyone else survived the whole loop.
    assert snapshot_read(spark, dim_path).count() == customer.count() - 1
    assert (snapshot_read(spark, fact_path).count()
            == orders.count() - n_victim_orders)
