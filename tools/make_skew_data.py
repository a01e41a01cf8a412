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
        if name == "orders.parquet":
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

    cust = pq.read_table(os.path.join(src, "customer.parquet"),
                         columns=["c_custkey"])
    custkeys = np.sort(cust.column("c_custkey").to_numpy())
    orders = pq.read_table(os.path.join(src, "orders.parquet"))
    newkeys = zipf_custkeys(custkeys, orders.num_rows, s, seed)
    kt = orders.schema.field("o_custkey").type
    idx = orders.schema.get_field_index("o_custkey")
    orders = orders.set_column(idx, "o_custkey",
                               pa.array(newkeys, type=kt))
    pq.write_table(orders, os.path.join(dest, "orders.parquet"))
    hot = pc.sum(pc.equal(orders.column("o_custkey"),
                          pa.scalar(int(custkeys[0]), type=kt))).as_py()
    print(f"orders.parquet: {orders.num_rows} rows rewritten, "
          f"hot key {int(custkeys[0])} holds "
          f"{hot / orders.num_rows:.1%} (zipf s={s}, seed={seed})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
