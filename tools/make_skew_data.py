"""Skewed-fixture generator: Zipf-reassign the orders→customer key.

The stacked-copy scale fixtures (tools/make_scale_data.py) preserve the
source's near-uniform key distributions, so the skew machinery
(operators/skew.py: auto_join / auto_agg salting cutovers, AQE skew
splits) never fires on the scale curve — every regime stamp reads
"plain". Real warehouse data skews: one hospital system produces half
the visits. This tool takes an existing fixture dir and rewrites ONLY
orders.parquet, reassigning o_custkey by a truncated Zipf over the
existing customer keys (rank 1 = the hot system), hard-linking every
other table — so the skewed variant costs one table's disk, keeps FK
validity (every assigned key exists in customer), and keeps every query
oracle-checkable (Spark and DuckDB read the same files, whatever their
distribution).

With the default s=1.5 the hot customer holds ~38% of all orders
(1/H(1.5), H = zeta), tripping auto_join's 0.2 hot-share threshold —
BENCH_sf10skew.json stamps auto_join[c_custkey]=salted:N where the
uniform sf10 point stamps plain.

Usage:
    python tools/make_skew_data.py [src_dir] [dest_dir] [s] [seed]
Defaults: .testdata/sf10 -> .testdata/sf10skew, s=1.5, seed=7.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ranks beyond this carry ~0.3% of the mass at s=1.5; truncating keeps
# the pmf array small at any customer-table size
MAX_RANKS = 100_000


def zipf_custkeys(custkeys: np.ndarray, n_orders: int, s: float,
                  seed: int) -> np.ndarray:
    """Sample ``n_orders`` customer keys with P(rank r) ∝ 1/r^s over the
    given key array (rank 1 = custkeys[0]). Deterministic for a seed."""
    n = min(len(custkeys), MAX_RANKS)
    pmf = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    pmf /= pmf.sum()
    rng = np.random.default_rng(seed)
    ranks = rng.choice(n, size=n_orders, p=pmf)
    return custkeys[ranks]


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".testdata", "sf10")
    dest = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".testdata", "sf10skew")
    s = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 7

    os.makedirs(dest, exist_ok=True)
    for name in sorted(os.listdir(src)):
        if not name.endswith(".parquet"):
            continue
        sp, dp = os.path.join(src, name), os.path.join(dest, name)
        if name in ("orders.parquet", "lineitem.parquet"):
            continue  # rewritten below
        if os.path.exists(dp):
            os.remove(dp) if os.path.isfile(dp) else None
        if os.path.isdir(sp):  # directory-style table: link members
            os.makedirs(dp, exist_ok=True)
            for f in os.listdir(sp):
                t = os.path.join(dp, f)
                if not os.path.exists(t):
                    os.link(os.path.join(sp, f), t)
        elif not os.path.exists(dp):
            os.link(sp, dp)
        print(f"{name}: linked")

    def rewrite(table: str, col: str, domain_table: str, domain_col: str,
                seed_off: int) -> None:
        dom = pq.read_table(os.path.join(src, f"{domain_table}.parquet"),
                            columns=[domain_col])
        keys = np.sort(dom.column(domain_col).to_numpy())
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        newkeys = zipf_custkeys(keys, t.num_rows, s, seed + seed_off)
        kt = t.schema.field(col).type
        t = t.set_column(t.schema.get_field_index(col), col,
                         pa.array(newkeys, type=kt))
        pq.write_table(t, os.path.join(dest, f"{table}.parquet"))
        hot = pc.sum(pc.equal(t.column(col),
                              pa.scalar(int(keys[0]), type=kt))).as_py()
        print(f"{table}.parquet: {t.num_rows} rows rewritten, hot "
              f"{col}={int(keys[0])} holds {hot / t.num_rows:.1%} "
              f"(zipf s={s}, seed={seed + seed_off})")

    # fact→dim skew: one hot customer owns ~38% of orders
    rewrite("orders", "o_custkey", "customer", "c_custkey", 0)
    # fact→fact skew: one hot order owns ~38% of lineitems — the shape
    # where neither join side broadcasts and skew actually decides plans
    rewrite("lineitem", "l_orderkey", "orders", "o_orderkey", 1)

    # Provenance manifest (r7 verdict item 4): the generator is seeded,
    # so the fixture is a pure function of (src, s, seed) — record the
    # content md5 of the two rewritten tables so any BENCH record made
    # on this fixture can assert it ran on THE fixture the committed
    # evidence used, and a fresh regeneration can be checked against the
    # committed hash with one diff.
    import hashlib
    import json

    def md5_file(path: str) -> str:
        h = hashlib.md5()
        with open(path, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 22), b""):
                h.update(chunk)
        return h.hexdigest()

    manifest = {
        "generator": "tools/make_skew_data.py",
        "src": os.path.basename(os.path.abspath(src)),
        "zipf_s": s,
        "seed": seed,
        "content_md5": {
            "orders.parquet": md5_file(os.path.join(dest, "orders.parquet")),
            "lineitem.parquet": md5_file(os.path.join(dest, "lineitem.parquet")),
        },
    }
    with open(os.path.join(dest, "_skew_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    print(f"_skew_manifest.json: {manifest['content_md5']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
