"""Distributed graph connectivity: connected components over an edge list.

The clustering step of near-duplicate detection: pair generation
(LSH/SimHash/Jaccard) yields edges; a training corpus keeps ONE document
per connected component. The reference has no analog; semantics follow
the standard min-label-propagation formulation (Kiveris et al.'s
large-star/small-star family — this is the simple propagation variant,
appropriate because near-dup graphs are dense clique-ish clusters with
tiny diameter).

Algorithm: every node's label starts as its own id; each round replaces
it with the minimum label in its closed neighborhood (itself + direct
neighbors); converged when no label changes. Rounds needed = graph
diameter — 2-3 for dup clusters; a ``max_iter`` guard raises on
pathological chains instead of looping forever. Each round is one
shuffle (explode edges both ways + min-aggregate + join back); lineage
is truncated with ``localCheckpoint`` every round so plan depth stays
constant no matter how many iterations run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 25) -> DataFrame:
    """Label every node with the MINIMUM node id reachable from it.

    Returns (node, component) — deterministic: the component id is the
    smallest member id, independent of partitioning or iteration order.
    Raises RuntimeError if ``max_iter`` rounds don't converge (diameter
    larger than max_iter — not a near-dup-shaped graph)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a").agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components: no convergence in {max_iter} rounds "
        f"(graph diameter too large for min-label propagation)"
    )


def dedup_cluster_assignments(pairs: DataFrame, id_a: str = "id_a",
                              id_b: str = "id_b") -> DataFrame:
    """Near-dup cluster assignment from candidate pairs: (doc_id,
    cluster_rep, cluster_size) for every doc that belongs to a multi-doc
    cluster; cluster_rep is the min doc id (the keep-policy
    representative)."""
    comp = connected_components(pairs, src=id_a, dst=id_b)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_rep"),
            "cluster_size",
        )
    )


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             damping: float = 0.85, n_iter: int = 10) -> DataFrame:
    """Distributed PageRank by power iteration over an edge list —
    centrality for link/similarity graphs (a duplicate-cluster's most
    central doc, a domain's authority in a crawl). Fixed iteration
    count keeps the result deterministic-shaped (no convergence
    tie-breaking); lineage truncates per round like the
    connected-components loop so plan depth stays constant.

    Per round: contributions = rank/out_degree exploded along edges,
    one groupBy(dst) shuffle, then the damping blend. Dangling nodes
    (no out-edges) redistribute uniformly — their mass is a 1-row
    aggregate broadcast, not a per-node join. Ranks normalize to sum
    = node count (the classic formulation: initial rank 1.0 each)."""
    sym_nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = sym_nodes.count()
    out_deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg"))
    ranks = sym_nodes.withColumn("rank", F.lit(1.0))
    for _ in range(n_iter):
        with_deg = ranks.join(out_deg, "node", "left")
        # Contribution sums run over integer MICRO-UNITS: each per-edge
        # contribution is quantized to 1e-12 with the IEEE-pure floor
        # formula (floor(c*1e12 + 0.5) — an exact integer-valued double
        # for any sane rank magnitude), summed exactly in DECIMAL(38,0),
        # and scaled back with one double division. Float sums are
        # partition-order-dependent; exact integer sums are not — so
        # every iteration's ranks are bit-identical under any
        # partitioning AND replayable by another engine (double→decimal
        # casts of FRACTIONAL values disagree across engines — DuckDB
        # float-scales, Spark rounds the exact expansion — but integral
        # doubles cast exactly everywhere). The 1e-12 quantization per
        # edge per iteration is far below any ranking-relevant scale.
        def _qsum(col):
            return (
                F.sum(F.floor(col * F.lit(1e12) + F.lit(0.5))
                      .cast("decimal(38,0)"))
                .cast("double") / F.lit(1e12)
            )

        # dangling mass: ranks of nodes with no out-edges, one scalar
        dangling = (
            with_deg.filter(F.col("out_deg").isNull())
            .agg(F.coalesce(_qsum(F.col("rank")), F.lit(0.0)).alias("__dm"))
        )
        contrib = (
            edges.join(
                with_deg.filter(F.col("out_deg").isNotNull())
                .select("node", (F.col("rank") / F.col("out_deg")).alias("__c")),
                edges[src] == F.col("node"))
            .groupBy(F.col(dst).alias("node"))
            .agg(_qsum(F.col("__c")).alias("__in"))
        )
        ranks = (
            sym_nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))  # 1-row scalar: bounded
            .select(
                "node",
                (F.lit(1.0 - damping)
                 + damping * (F.coalesce(F.col("__in"), F.lit(0.0))
                              + F.col("__dm") / n_nodes)).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
