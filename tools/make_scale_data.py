"""Scale-up fixture generator: replicate an sf dir K× with key offsets.

The driver fixtures stop at sf0.1 (~600k lineitem). Scale-posture claims
("AQE flips join_3way broadcast→shuffle", "nothing degrades
super-linearly") deserve one order of magnitude of real data, so this
tool builds sfN = K stacked copies of a source dir with every key column
offset per copy — FK consistency holds within each copy, so join
cardinalities scale exactly linearly and aggregate distributions are
preserved. Correctness comparisons stay valid because the oracle gate
compares Spark vs DuckDB over the SAME files, whatever their content.

pyarrow end-to-end: preserves the exact physical schemas, including the
events table's nanosecond INT64 timestamps that Spark's batch reader
needs nanosAsLong for (writing through Spark would silently rewrite them
as micros and un-test the nanos pin).

Usage:
    python tools/make_scale_data.py [src_dir] [dest_dir] [k]
Defaults: /root/testdata/sf0.1 -> <repo>/.testdata/sf1, k=10.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Key columns to offset per copy, per table. Offsets use (1 + max(key))
# of the source so copies never collide; shared dimensions (region,
# nation) and FK columns into them (c_nationkey, s_nationkey) are left
# alone — 10× the customers over the same 25 nations is exactly how the
# real schema scales.
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]

# FK domains must share one offset so references stay aligned across
# tables (orders.o_custkey must land on a copied customer.c_custkey).
DOMAIN_OF = {
    "c_custkey": "custkey", "o_custkey": "custkey", "user_id": "custkey",
    "s_suppkey": "suppkey", "l_suppkey": "suppkey",
    "p_partkey": "partkey", "l_partkey": "partkey",
    "o_orderkey": "orderkey", "l_orderkey": "orderkey",
    "event_id": "eventkey",
    "doc_id": "dockey",
    "vec_id": "veckey",
}


def _domain_offsets(src: str) -> dict[str, int]:
    """1 + max(key) per FK domain, from the table that owns the domain."""
    owners = {
        "custkey": ("customer", "c_custkey"),
        "suppkey": ("supplier", "s_suppkey"),
        "partkey": ("part", "p_partkey"),
        "orderkey": ("orders", "o_orderkey"),
        "eventkey": ("events", "event_id"),
        "dockey": ("documents", "doc_id"),
        "veckey": ("embeddings", "vec_id"),
    }
    out = {}
    for dom, (tbl, col) in owners.items():
        path = os.path.join(src, f"{tbl}.parquet")
        t = pq.read_table(path, columns=[col])
        out[dom] = int(pc.max(t.column(col)).as_py()) + 1
    return out


def md5_file(path: str) -> str:
    import hashlib

    h = hashlib.md5()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 22), b""):
            h.update(chunk)
    return h.hexdigest()


def rows_per_group(src_path: str) -> int:
    """Bytes-aimed row-group size: ~16 MB of on-disk bytes per group,
    clamped to [50k, 1M] rows.

    Why it matters: parquet scans split at ROW-GROUP boundaries, so a
    file with few huge groups caps scan parallelism at the group count
    no matter how many cores the cluster has. The original writer
    emitted one group per stacked copy — sf30×2 gave sf60's embeddings
    TWO 600k-row groups, and every downstream per-vector fold ran on 2
    of 32 cores (measured: ann_cosine_topk 17.2 s at sf60 vs 9.4 s at
    sf100, whose ×10 stacking happened to leave 10 groups — the r7
    scale-curve inversion for the whole embedding family)."""
    st = os.stat(src_path)
    nrows = pq.ParquetFile(src_path).metadata.num_rows
    bytes_per_row = max(1.0, st.st_size / max(1, nrows))
    return int(min(1 << 20, max(50_000, (16 << 20) / bytes_per_row)))


def scale_table(src: str, dest: str, name: str, k: int,
                offsets: dict[str, int]) -> int:
    """Stream the k offset copies through one ParquetWriter (bounded
    row groups — see rows_per_group) instead of concatenating them in
    RAM: peak memory is ONE source-table copy regardless of k, which is
    what makes sf100 (lineitem 600M rows) generatable on this host."""
    src_path = os.path.join(src, f"{name}.parquet")
    rg = rows_per_group(src_path)
    t = pq.read_table(src_path)
    out = os.path.join(dest, f"{name}.parquet")
    n = 0
    with pq.ParquetWriter(out, t.schema) as w:
        for i in range(k):
            if i == 0:
                piece = t
            else:
                cols = []
                for field in t.schema:
                    col = t.column(field.name)
                    if field.name in KEYED.get(name, []):
                        off = i * offsets[DOMAIN_OF[field.name]]
                        col = pc.add(col, pa.scalar(off, type=field.type))
                    cols.append(col)
                piece = pa.table(dict(zip(t.schema.names, cols)),
                                 schema=t.schema)
            w.write_table(piece, row_group_size=rg)
            n += piece.num_rows
    return n


def relayout_table(path: str) -> None:
    """Content-preserving row-group rewrite of an existing fixture table
    (same rows, same order; only the group boundaries change) — repairs
    fixtures written by the pre-fix generator without changing any query
    result. Usage: python tools/make_scale_data.py --relayout <file>…"""
    rg = rows_per_group(path)
    groups = pq.ParquetFile(path).metadata.num_row_groups
    t = pq.read_table(path)
    tmp = path + ".relayout"
    pq.write_table(t, tmp, row_group_size=rg)
    os.replace(tmp, path)
    print(f"{path}: {groups} -> {pq.ParquetFile(path).metadata.num_row_groups}"
          f" row groups ({t.num_rows} rows unchanged)")
    # The rewrite changes the file BYTES (group boundaries) even though
    # no row changes, so the sibling _scale_manifest.json's content_md5
    # must be refreshed or bench.py stamps a stale hash into BENCH
    # provenance — the exact fixture/artifact mismatch the manifest
    # exists to catch.
    import json

    mpath = os.path.join(os.path.dirname(os.path.abspath(path)),
                         "_scale_manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as fh:
            manifest = json.load(fh)
        key = os.path.basename(path)
        if key in manifest.get("content_md5", {}):
            manifest["content_md5"][key] = md5_file(path)
            with open(mpath, "w") as fh:
                json.dump(manifest, fh, indent=1, sort_keys=True)
            print(f"_scale_manifest.json: {key} md5 refreshed")


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--relayout":
        for p in sys.argv[2:]:
            relayout_table(p)
        return 0
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".testdata", "sf1")
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dest, exist_ok=True)
    for name in COPY_AS_IS:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(dest, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows (copied)")
    offsets = _domain_offsets(src)
    for name in KEYED:
        n = scale_table(src, dest, name, k, offsets)
        print(f"{name}: {n} rows (x{k})")

    # Provenance manifest (r8 verdict item 1, generalizing the skew-
    # fixture discipline that caught a stale committed bench row): the
    # fixture is a pure function of (src bytes, k), so stamp the content
    # md5 of every output table. bench.py copies this into the BENCH
    # record's provenance, making "which bytes did this curve run on"
    # a one-diff check against a fresh regeneration.
    import json

    manifest = {
        "generator": "tools/make_scale_data.py",
        "src": os.path.basename(os.path.abspath(src)),
        "k": k,
        "content_md5": {
            f"{name}.parquet": md5_file(os.path.join(dest, f"{name}.parquet"))
            for name in COPY_AS_IS + list(KEYED)
        },
    }
    with open(os.path.join(dest, "_scale_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    print(f"_scale_manifest.json written ({len(manifest['content_md5'])} tables)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
