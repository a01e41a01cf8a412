"""bench_compare must flag plan regressions, not host weather: per-query
ratios are normalized by each run's drift canary before flagging."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from bench_compare import canary_sec, compare  # noqa: E402


def _bench(queries, canary=None):
    doc = {"metric": "headline_queries_total",
           "value": round(sum(queries.values()), 3),
           "queries": queries}
    if canary is not None:
        doc["provenance"] = {"drift_canary": {"query": "agg_by_agegroup",
                                              "sec": canary}}
    return doc


def test_uniform_host_drift_is_not_flagged():
    # the whole host got 2x slower (canary too): every raw ratio is 2.0
    # but normalized ratios are 1.0 — nothing flags
    old = _bench({"q1": 1.0, "q2": 2.0}, canary=0.5)
    new = _bench({"q1": 2.0, "q2": 4.0}, canary=1.0)
    rows, flagged, normalized = compare(old, new, ratio=1.5)
    assert normalized and flagged == []
    assert all(abs(r[4] - 1.0) < 1e-9 for r in rows)


def test_true_regression_flags_through_drift():
    # host 2x slower AND q2 regressed 4x raw = 2x normalized -> flagged;
    # q1 only drifted -> clean
    old = _bench({"q1": 1.0, "q2": 1.0}, canary=0.5)
    new = _bench({"q1": 2.0, "q2": 4.0}, canary=1.0)
    _, flagged, normalized = compare(old, new, ratio=1.5)
    assert normalized
    assert [f[0] for f in flagged] == ["q2"]
    assert abs(flagged[0][4] - 2.0) < 1e-9  # normalized ratio


def test_fast_host_cannot_mask_regression():
    # host got 2x FASTER; q1 reads 1.2x raw but is 2.4x normalized
    old = _bench({"q1": 1.0}, canary=1.0)
    new = _bench({"q1": 1.2}, canary=0.5)
    _, flagged, normalized = compare(old, new, ratio=1.5)
    assert normalized and [f[0] for f in flagged] == ["q1"]


def test_missing_canary_falls_back_to_raw():
    old = _bench({"q1": 1.0})
    new = _bench({"q1": 2.0}, canary=1.0)
    rows, flagged, normalized = compare(old, new, ratio=1.5)
    assert not normalized
    assert [f[0] for f in flagged] == ["q1"]
    assert rows[0][4] is None  # no normalized column
    assert canary_sec(old) is None and canary_sec(new) == 1.0


def test_new_query_without_baseline_is_reported_not_flagged():
    old = _bench({"q1": 1.0}, canary=1.0)
    new = _bench({"q1": 1.0, "q_new": 9.9}, canary=1.0)
    rows, flagged, _ = compare(old, new, ratio=1.5)
    assert flagged == []
    assert any(r[0] == "q_new" and r[1] is None for r in rows)
