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
