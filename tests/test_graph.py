"""Connected components / near-dup clustering (operators/graph.py)."""

from __future__ import annotations

import pytest

from healthcare_data_warehouse_spark.operators.graph import (
    connected_components,
    dedup_cluster_assignments,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r.node: r.component
        for r in connected_components(df, **kw).collect()
    }


def test_two_cliques(spark):
    got = _cc(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_chain_converges_across_rounds(spark):
    # a 9-node path needs several propagation rounds — exercises the loop
    edges = [(i, i + 1) for i in range(1, 9)]
    got = _cc(spark, edges)
    assert set(got.values()) == {1}
    assert len(got) == 9


def test_star_graph(spark):
    got = _cc(spark, [(5, 1), (5, 2), (5, 3), (5, 4)])
    assert set(got.values()) == {1}


def test_max_iter_guard_raises(spark):
    edges = [(i, i + 1) for i in range(1, 30)]
    with pytest.raises(RuntimeError, match="no convergence"):
        _cc(spark, edges, max_iter=2)


def test_cluster_assignments_sizes(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], ["id_a", "id_b"]
    )
    rows = {r.doc_id: (r.cluster_rep, r.cluster_size)
            for r in dedup_cluster_assignments(pairs).collect()}
    assert rows == {1: (1, 3), 2: (1, 3), 3: (1, 3), 7: (7, 2), 8: (7, 2)}


def test_pagerank_matches_numpy_power_iteration(spark):
    """10 fixed power iterations over a small directed graph must match
    a straight-line numpy replay of the same formulation (uniform
    dangling redistribution, damping 0.85) to 1e-9 per node."""
    from healthcare_data_warehouse_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (6, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df).collect()}

    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    ranks = {m: 1.0 for m in nodes}
    for _ in range(10):
        dangling = sum(r for m, r in ranks.items() if m not in out)
        nxt = {}
        for m in nodes:
            inc = sum(ranks[s] / len(out[s])
                      for s in nodes if s in out and m in out[s])
            nxt[m] = 0.15 + 0.85 * (inc + dangling / n)
        ranks = nxt
    assert set(got) == set(nodes)
    for m in nodes:
        assert abs(got[m] - ranks[m]) < 1e-9, (m, got[m], ranks[m])
