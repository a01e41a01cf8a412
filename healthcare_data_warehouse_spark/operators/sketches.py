"""Count-min sketch: mergeable frequency estimation + heavy hitters.

The LLM-corpus use case: "how often does this token / url / near-dup key
occur across 100 TB?" asked repeatedly, without rescanning the corpus.
A count-min sketch is a (depth × width) grid of counters, each row keyed
by an independent hash; an item's estimate is the MIN over its depth
counters — always an overestimate, off by at most ~(e/width)·N with
probability 1-2^-depth (Cormode & Muthukrishnan 2005).

Spark-first representation: the sketch is itself a DataFrame of
``(h, bucket, cnt)`` rows (≤ depth × width of them, whatever the input
size) built with native exprs only — explode each value into its depth
(row, bucket) cells, then one hash-groupBy with map-side partial
aggregation. That makes the sketch:

- **mergeable**: union two sketch frames and re-sum — the algebra the
  driver-side ``df.stat`` sketches don't expose;
- **storable**: persist the ≤ depth×width rows at ingest, answer
  frequency queries later from the sketch alone (same design as the
  ingest-time IVF index in ``similarity.py``);
- **joinable**: estimating a batch of items is a broadcast join of the
  items' computed cells against the sketch — no scan of the source.

(Spark does have a native ``count_min_sketch`` SQL aggregate returning an
opaque binary; the relational encoding here is equivalent, stays
queryable with DataFrame ops, and merges with a groupBy.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEPTH = 5
WIDTH = 2048
SEED = 1789


def _cells(col: str, depth: int, width: int, seed: int):
    """The depth (h, bucket) cells for a value — depth independent hash
    functions from DISJOINT 6-hex slices of ONE md5 (row h reads hex
    chars 1+6h..6+6h; md5 bits are independent, and codegen's
    common-subexpression elimination evaluates the md5 once per value).
    Bit-replayable by the DuckDB oracle:
    ``('0x' || substr(md5('cms{seed}:' || v), 1+6*h, 6))::BIGINT % width``.
    Needs depth ≤ 5 at 6 hex per row (32 hex available)."""
    from ..functions.expressions import hexslice, md5hex

    if depth > 5:
        raise ValueError("_cells: depth > 5 exceeds the md5 hex budget")
    m = md5hex(F.col(col), f"cms{seed}:")
    return F.array(*[
        F.struct(
            F.lit(h).alias("h"),
            F.pmod(hexslice(m, 1 + 6 * h, 6), F.lit(width)).alias("bucket"),
        )
        for h in range(depth)
    ])


def build_cms(df: DataFrame, col: str, depth: int = DEPTH, width: int = WIDTH,
              seed: int = SEED) -> DataFrame:
    """Build the sketch: ``(h, bucket, cnt)``, ≤ depth×width rows.

    One explode (×depth) + one groupBy; partial aggregation collapses the
    explosion map-side, so the shuffle carries at most depth×width rows
    per task regardless of input size.
    """
    return (
        df.select(F.explode(_cells(col, depth, width, seed)).alias("c"))
        .groupBy(F.col("c.h").alias("h"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_cms(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width, seed): union +
    re-sum. Counter-wise addition — the CMS merge law."""
    if not sketches:
        raise ValueError("merge_cms: nothing to merge")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("h", "bucket").agg(F.sum("cnt").alias("cnt"))


def estimate_counts(cms: DataFrame, items: DataFrame, col: str,
                    depth: int = DEPTH, width: int = WIDTH,
                    seed: int = SEED) -> DataFrame:
    """Estimated frequency for each distinct value in ``items[col]``.

    Explode the items into their cells, join against the sketch
    (broadcast — the sketch is ≤ depth×width rows, genuinely bounded, so
    the hint is safe), take MIN over the depth counters. Missing cells
    count 0 (value never sketched).
    """
    exploded = (
        items.select(col).distinct()
        .select(col, F.explode(_cells(col, depth, width, seed)).alias("c"))
        .select(col, F.col("c.h").alias("h"), F.col("c.bucket").alias("bucket"))
    )
    return (
        exploded.join(F.broadcast(cms), ["h", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )


def heavy_hitters(df: DataFrame, col: str, k: int = 20,
                  candidate_fraction: float | None = None,
                  depth: int = DEPTH, width: int = WIDTH,
                  seed: int = SEED) -> DataFrame:
    """Top-k most frequent values of ``col`` by CMS estimate.

    ``candidate_fraction`` is the scale knob: with it set, candidates come
    from a seeded SAMPLE of the data (a true heavy hitter appears in any
    non-trivial sample with near-certainty), so the expensive
    distinct-shuffle runs over a fraction of the input while counts still
    come from the full-data sketch. ``None`` = exact candidate set
    (all distinct values), for small/medium domains.
    """
    cms = build_cms(df, col, depth, width, seed)
    cand = df.sample(candidate_fraction, seed=seed) if candidate_fraction else df
    est = estimate_counts(cms, cand, col, depth, width, seed)
    return (
        est.orderBy(F.desc("est_count"), F.asc(col)).limit(int(k))
    )


# ---------------------------------------------------------------------------
# HLL sketches (distinct-count analog of the CMS above) — Spark's native
# Apache DataSketches bindings: hll_sketch_agg / hll_union_agg /
# hll_sketch_estimate. The sketch column is a binary, mergeable,
# storable aggregation state.
# ---------------------------------------------------------------------------

def build_hll_sketches(df: DataFrame, col: str, group_cols: list[str],
                       lg_k: int = 12) -> DataFrame:
    """Per-group HLL sketch of ``col``'s distinct values.

    The ingest-side half of incremental distinct counting: persist these
    (e.g. one row per day) and any coarser distinct-count question is
    answered from the sketches alone — history is never rescanned. One
    map-side-combining groupBy; each sketch is ~2^lg_k bytes."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("hll"))


def hll_estimates(sketches: DataFrame) -> DataFrame:
    """Read each group's distinct-count estimate off its sketch."""
    return sketches.select(
        *[c for c in sketches.columns if c != "hll"],
        F.hll_sketch_estimate("hll").alias("n_distinct_est"),
    )


def hll_rollup(sketches: DataFrame, rollup_cols: list[str]) -> DataFrame:
    """Merge fine-grained sketches up to ``rollup_cols`` granularity and
    estimate — e.g. daily user sketches → monthly distinct users. The
    union is sketch-sized work: no raw data involved."""
    grouped = (
        sketches.groupBy(*rollup_cols).agg(F.hll_union_agg("hll").alias("hll"))
        if rollup_cols
        else sketches.agg(F.hll_union_agg("hll").alias("hll"))
    )
    return hll_estimates(grouped)


# ---------------------------------------------------------------------------
# md5-HLL — repo-owned, oracle-REPLAYABLE distinct-count sketch (the
# hash-certifiable twin of the DataSketches binding above, same move that
# took the CMS heavy hitters from rows-only to driver-green in round 3).
# ---------------------------------------------------------------------------

HLL_P = 12          # 2^12 = 4096 registers → rsd ≈ 1.04/√m ≈ 1.6%
HLL_SALT = "hll:"   # md5 domain separation from the other md5-keyed ops


def _hll_consts(p: int) -> tuple[int, float]:
    m = 2 ** p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    return m, alpha


def hll_md5_distinct(df: DataFrame, group_cols: list[str], col: str,
                     p: int = HLL_P, out: str = "n_distinct_est") -> DataFrame:
    """Per-group distinct-count estimate from an md5-register HyperLogLog
    (Flajolet et al. 2007) built entirely from native exprs — every bit
    REPLAYABLE by ``hll_md5_oracle_sql`` in DuckDB, unlike the opaque
    HLL++/DataSketches binaries.

    Register assignment: one md5 per value; hex[1..p/4] is the register
    index (m = 2^p registers), hex[p/4+1 .. +13] is a 52-bit tail w whose
    leading-zero rank ρ = 53 − bitlength(w) (w=0 ⇒ 53) feeds max-per-
    register. Estimation is the standard α_m·m²/Σ2^(−M_j) with
    linear-counting small-range correction (E ≤ 2.5m and empty registers
    present ⇒ m·ln(m/V)).

    Bit-exact cross-engine arithmetic: Σ2^(−M_j) is computed as an EXACT
    integer sum Σ2^(53−M_j) in DECIMAL(38,0) (no order-dependent float
    accumulation), absent registers contribute (m−n)·2^53 exactly, and
    the final combine is a fixed sequence of IEEE double ops over
    identical literals — verified repr-identical to DuckDB on every
    group (both regimes).

    100 TB shape: two keyed shuffles, both map-side combining — (group,
    register) max, then a ≤ m-row-per-group rollup; register relations
    are mergeable (union + re-max), storable, and rollup-able exactly
    like ``build_hll_sketches``'s binaries."""
    from ..functions.expressions import md5hex, round2

    if p % 4 != 0 or not (8 <= p <= 16):
        raise ValueError("p must be a multiple of 4 in [8, 16]")
    m, alpha = _hll_consts(p)
    idx_hex = p // 4
    num = alpha * m * m * float(2 ** 53)
    pow53 = float(2 ** 53)

    h = md5hex(col, HLL_SALT)
    idx = F.conv(F.substring(h, 1, idx_hex), 16, 10).cast("int")
    w = F.conv(F.substring(h, idx_hex + 1, 13), 16, 10).cast("long")
    rank = F.when(w == 0, F.lit(53)).otherwise(53 - F.length(F.bin(w)))

    regs = (
        df.select(*group_cols, idx.alias("__idx"), rank.alias("__r"))
        .groupBy(*group_cols, "__idx").agg(F.max("__r").alias("__mr"))
    )
    per_g = regs.groupBy(*group_cols).agg(
        F.count("*").alias("__np"),
        F.sum(F.expr(
            "CAST(shiftleft(CAST(1 AS BIGINT), 53 - __mr) AS DECIMAL(38,0))"
        )).alias("__sp"),
    )
    stot = (F.col("__sp").cast("double")
            + (F.lit(m) - F.col("__np")).cast("double") * F.lit(pow53))
    e_raw = F.lit(num) / stot
    v = F.lit(m) - F.col("__np")
    est = F.when(
        (e_raw <= 2.5 * m) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    return per_g.select(*group_cols, round2(est).alias(out))


def hll_md5_oracle_sql(table: str, group_col: str, col: str,
                       p: int = HLL_P, out: str = "n_distinct_est") -> str:
    """The DuckDB replay of ``hll_md5_distinct`` — generated from the SAME
    constants so the two sides cannot drift."""
    m, alpha = _hll_consts(p)
    idx_hex = p // 4
    num = alpha * m * m * float(2 ** 53)
    pow53 = float(2 ** 53)
    return f"""
    WITH h AS (
      SELECT {group_col} AS g,
             md5('{HLL_SALT}' || CAST({col} AS VARCHAR)) AS m
      FROM {table}
    ),
    bits AS (
      SELECT g,
             ('0x' || substring(m, 1, {idx_hex}))::BIGINT AS idx,
             ('0x' || substring(m, {idx_hex + 1}, 13))::BIGINT AS w
      FROM h
    ),
    regs AS (
      SELECT g, idx,
             max(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS mr
      FROM bits GROUP BY g, idx
    ),
    per_g AS (
      SELECT g, count(*) AS np,
             sum(CAST(1::BIGINT << (53 - mr) AS DECIMAL(38,0))) AS sp
      FROM regs GROUP BY g
    ),
    est AS (
      SELECT g, np,
             {num!r} / (CAST(sp AS DOUBLE)
                        + CAST({m} - np AS DOUBLE) * {pow53!r}) AS e_raw
      FROM per_g
    )
    SELECT g AS {group_col},
      floor((CASE WHEN e_raw <= {2.5 * m} AND ({m} - np) > 0
                  THEN {float(m)!r} * ln({float(m)!r} / CAST({m} - np AS DOUBLE))
                  ELSE e_raw END) * 100 + 0.5) / 100 AS {out}
    FROM est
    """


# ---------------------------------------------------------------------------
# Hash-sample percentile — deterministic bounded-size quantile estimate,
# oracle-replayable (the certifiable stand-in for percentile_approx's
# opaque KLL-style sketch).
# ---------------------------------------------------------------------------

QSAMPLE_RATE = 0.2


def hash_sample_percentile(df: DataFrame, group_cols: list[str], col: str,
                           q: float, id_col: str,
                           rate: float = QSAMPLE_RATE,
                           out: str = "pctl_est") -> DataFrame:
    """Approximate per-group percentile: exact interpolated percentile
    over a DETERMINISTIC md5-Bernoulli row sample (keep iff the id's
    4-hex md5 key < the rate threshold — ``curation.det_key`` /
    ``hex_threshold``, the same primitive the stratified sampler uses).

    Why this sketch: the sample is a uniform coreset with standard
    O(1/√(rate·n)) quantile error, it is MERGEABLE (hash-sampling
    commutes with union — a fixed id keeps or drops identically in every
    partition/backfill), and unlike KLL/t-digest internals it is
    bit-replayable in any engine with md5. ``rate`` is the size knob: at
    100 TB pick rate ≈ target_sample/n so the per-group sort stays
    bounded; the sampling filter is a narrow predicate pushed into the
    scan, and the percentile itself is one map-side-light groupBy over
    ~rate·n rows (vs the full shuffle of the exact A6 path)."""
    from ..functions.expressions import round2
    from .curation import det_key, hex_threshold

    kept = df.filter(det_key(id_col) < F.lit(hex_threshold(rate)))
    return kept.groupBy(*group_cols).agg(
        round2(F.percentile(col, F.lit(q))).alias(out))


def hash_sample_percentile_oracle_sql(table: str, group_col: str, col: str,
                                      q: float, id_col: str,
                                      rate: float = QSAMPLE_RATE,
                                      out: str = "pctl_est") -> str:
    """DuckDB replay of ``hash_sample_percentile`` (same threshold
    constant via ``hex_threshold``; quantile_cont ≡ Spark percentile's
    linear interpolation — the certified-parity pair behind A6)."""
    from .curation import hex_threshold

    return f"""
    SELECT {group_col},
           floor(quantile_cont({col}, {q}) * 100 + 0.5) / 100 AS {out}
    FROM {table}
    WHERE substring(md5(CAST({id_col} AS VARCHAR)), 1, 4)
          < '{hex_threshold(rate)}'
    GROUP BY {group_col}
    """
