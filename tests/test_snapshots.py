"""Snapshot versioning: time travel, rollback, upsert isolation, vacuum."""

from __future__ import annotations

import os

import pytest

from healthcare_data_warehouse_spark.sources.snapshots import (
    latest_version,
    snapshot_history,
    snapshot_read,
    snapshot_rollback,
    snapshot_upsert,
    snapshot_vacuum,
    snapshot_write,
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "snap_table")


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, val string")


def test_write_read_time_travel(spark, table):
    assert latest_version(table) is None
    v1 = snapshot_write(_df(spark, [(1, "a"), (2, "b")]), table)
    v2 = snapshot_write(_df(spark, [(1, "a2")]), table)
    assert (v1, v2) == (1, 2)
    assert latest_version(table) == 2
    assert {r.val for r in snapshot_read(spark, table).collect()} == {"a2"}
    # v1 still fully readable after the v2 commit
    assert {r.val for r in snapshot_read(spark, table, version=1).collect()} == {"a", "b"}
    hist = snapshot_history(table)
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[1]["parent"] == 1 and hist[0]["parent"] is None


def test_rollback_then_write_allocates_fresh_version(spark, table):
    snapshot_write(_df(spark, [(1, "a")]), table)
    snapshot_write(_df(spark, [(1, "b")]), table)
    snapshot_rollback(table, 1)
    assert latest_version(table) == 1
    assert {r.val for r in snapshot_read(spark, table).collect()} == {"a"}
    # next commit must NOT reuse version 2 (it still exists on disk)
    v3 = snapshot_write(_df(spark, [(1, "c")]), table)
    assert v3 == 3
    assert {r.val for r in snapshot_read(spark, table, version=2).collect()} == {"b"}
    with pytest.raises(FileNotFoundError):
        snapshot_rollback(table, 99)


def test_upsert_preserves_prior_version_for_readers(spark, table):
    snapshot_write(_df(spark, [(1, "a"), (2, "b")]), table)
    old_reader = snapshot_read(spark, table, version=1)
    v2 = snapshot_upsert(spark, table, _df(spark, [(2, "B"), (3, "c")]), ["k"])
    assert v2 == 2
    merged = {r.k: r.val for r in snapshot_read(spark, table).collect()}
    assert merged == {1: "a", 2: "B", 3: "c"}
    # the pre-upsert DataFrame still reads version-1 files (no swap-under)
    assert {r.k: r.val for r in old_reader.collect()} == {1: "a", 2: "b"}


def test_vacuum_keeps_live_and_recent(spark, table):
    for tag in ("a", "b", "c", "d"):
        snapshot_write(_df(spark, [(1, tag)]), table)
    removed = snapshot_vacuum(table, keep_last=2)
    assert removed == [1, 2]
    assert [h["version"] for h in snapshot_history(table)] == [3, 4]
    with pytest.raises(FileNotFoundError):
        snapshot_read(spark, table, version=1)
    # pointer target survives vacuum even when it is old
    snapshot_rollback(table, 3)
    assert snapshot_vacuum(table, keep_last=1) == []
    assert {r.val for r in snapshot_read(spark, table).collect()} == {"c"}


def test_crash_debris_is_invisible(spark, table):
    snapshot_write(_df(spark, [(1, "a")]), table)
    # simulate a crashed writer: orphan tmp dir + orphan committed dir
    os.makedirs(os.path.join(table, "v00002__tmp"))
    assert latest_version(table) == 1
    v = snapshot_write(_df(spark, [(1, "b")]), table)
    assert v == 2  # tmp debris overwritten, not version-bumped
    assert {r.val for r in snapshot_read(spark, table).collect()} == {"b"}


def test_snapshot_diff_between_versions(spark, table):
    from healthcare_data_warehouse_spark.sources.snapshots import snapshot_diff

    snapshot_write(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), table)
    snapshot_upsert(spark, table, _df(spark, [(2, "B"), (4, "d")]), ["k"])
    d = {r.k: r for r in snapshot_diff(spark, table, ["k"], 1, 2).collect()}
    assert d[2].change_type == "update" and d[2].changed_cols == "val"
    assert d[4].change_type == "insert"
    assert 1 not in d and 3 not in d  # untouched rows absent from the feed
