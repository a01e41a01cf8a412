"""Snapshot-versioned parquet tables: time travel, rollback, vacuum.

The reference warehouse overwrites tables in place (scripts/etl.py reload;
no history — a bad load destroys the previous state). Real warehouses keep
every committed state readable: this module adds a minimal commit protocol
over plain parquet with the same shape Delta/Iceberg use —

- **immutable data**: each commit writes a brand-new ``v{N}`` directory;
  no file is ever modified after its version commits;
- **atomic pointer**: ``_LATEST`` (a one-line text file) names the current
  version and is updated via write-temp + ``os.replace`` (atomic on POSIX
  and on HDFS/S3 the analog is a metadata swap) — a reader sees the old or
  the new version at every instant, never a mix;
- **history as data**: per-version JSON in ``_meta/`` records op +
  row/file counts, so audit queries are plain reads.

Crash anywhere leaves a consistent table: an orphaned ``__tmp`` or
already-renamed ``v{N}`` directory that ``_LATEST`` doesn't reference is
invisible to readers and reclaimed by the next write/vacuum.

Single-writer by design (like a Hive table without a lock service); at
100 TB the per-commit cost is the data write itself — all metadata ops here
are O(1) renames independent of table size. Rewrite-per-version suits dims
and gold outputs; large facts version per-partition instead
(``sinks.backfill_partitions``).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

_VDIR = re.compile(r"^v(\d{5})$")
_LATEST = "_LATEST"
_META = "_meta"


def _vname(version: int) -> str:
    return f"v{version:05d}"


def _versions_on_disk(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for d in os.listdir(path):
        m = _VDIR.match(d)
        if m and os.path.isdir(os.path.join(path, d)):
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(path: str) -> int | None:
    """The committed version ``_LATEST`` points at (None = no table)."""
    p = os.path.join(path, _LATEST)
    if not os.path.exists(p):
        return None
    with open(p, encoding="ascii") as f:
        return int(f.read().strip())


def _set_latest(path: str, version: int) -> None:
    tmp = os.path.join(path, _LATEST + "__tmp")
    with open(tmp, "w", encoding="ascii") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(path, _LATEST))


def snapshot_write(df: DataFrame, path: str, op: str = "overwrite") -> int:
    """Commit ``df`` as the next version of the table at ``path``.

    Data lands in ``v{N}__tmp`` first; the commit is rename + pointer
    swap, so a crash mid-write never corrupts a committed version. The
    new version number is max-on-disk + 1 (not latest + 1), so versions
    stay unique even after a rollback moved the pointer backwards."""
    os.makedirs(os.path.join(path, _META), exist_ok=True)
    disk = _versions_on_disk(path)
    version = (disk[-1] + 1) if disk else 1
    vdir = os.path.join(path, _vname(version))
    tmp = vdir + "__tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    df.write.mode("overwrite").parquet(tmp)
    n_files = sum(1 for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.rename(tmp, vdir)
    meta = {
        "version": version,
        "op": op,
        "n_files": n_files,
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "parent": latest_version(path),
    }
    with open(os.path.join(path, _META, _vname(version) + ".json"),
              "w", encoding="utf-8") as f:
        json.dump(meta, f)
    _set_latest(path, version)
    return version


def snapshot_read(spark: SparkSession, path: str,
                  version: int | None = None) -> DataFrame:
    """Read the table at ``version`` (default: the current pointer) —
    time travel is just a different directory, so old versions stay
    readable (and plan-identical) after any number of later commits."""
    v = latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no snapshot table at {path}")
    vdir = os.path.join(path, _vname(v))
    if not os.path.isdir(vdir):
        raise FileNotFoundError(f"version {v} of {path} does not exist "
                                f"(vacuumed or never committed)")
    return spark.read.parquet(vdir)


def snapshot_history(path: str) -> list[dict]:
    """Commit log, oldest first (only versions still on disk)."""
    out = []
    for v in _versions_on_disk(path):
        mp = os.path.join(path, _META, _vname(v) + ".json")
        if os.path.exists(mp):
            with open(mp, encoding="utf-8") as f:
                out.append(json.load(f))
        else:
            out.append({"version": v, "op": "unknown"})
    return out


def snapshot_rollback(path: str, version: int) -> int:
    """Point the table back at an earlier committed version (Delta
    RESTORE analog). Pure pointer swap — nothing is rewritten, and the
    rolled-back-over versions remain in history until vacuumed."""
    if version not in _versions_on_disk(path):
        raise FileNotFoundError(f"version {version} of {path} does not exist")
    _set_latest(path, version)
    return version


def snapshot_upsert(spark: SparkSession, path: str, updates: DataFrame,
                    keys: list[str], op: str = "upsert") -> int:
    """MERGE as a new immutable version: read current, apply the keyed
    upsert, commit. Unlike ``sinks.upsert_to_path`` (which swaps files
    under any previously returned DataFrame), every pre-existing reader
    keeps a consistent version under its feet."""
    from .sinks import upsert

    current = latest_version(path)
    if current is None:
        return snapshot_write(updates, path, op=op)
    merged = upsert(snapshot_read(spark, path, current), updates, keys)
    return snapshot_write(merged, path, op=op)


def snapshot_diff(spark: SparkSession, path: str, keys: list[str],
                  from_version: int, to_version: int | None = None,
                  compare_cols: list[str] | None = None) -> DataFrame:
    """What changed between two committed versions — the time-travel
    answer to "what did last night's load do?". Composes the versioned
    reads with the CDC keyed diff (operators/cdc.py): one full-outer
    shuffle join on the key, rows tagged insert/delete/update with the
    changed-column list."""
    from ..operators.cdc import table_diff

    old = snapshot_read(spark, path, from_version)
    new = snapshot_read(spark, path, to_version)
    return table_diff(old, new, keys, compare_cols)


def snapshot_vacuum(path: str, keep_last: int = 2) -> list[int]:
    """Delete version directories beyond the newest ``keep_last``,
    always keeping the pointer's target. Returns removed versions."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    live = latest_version(path)
    disk = _versions_on_disk(path)
    removable = [v for v in disk[:-keep_last] if v != live]
    for v in removable:
        shutil.rmtree(os.path.join(path, _vname(v)))
        mp = os.path.join(path, _META, _vname(v) + ".json")
        if os.path.exists(mp):
            os.remove(mp)
    return removable
