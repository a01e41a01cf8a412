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


def test_regression_to_failure_is_flagged():
    # bench.py records a query that ERRORS under "errors" and drops it
    # from "queries" — the gate must flag it, not let it vanish
    old = _bench({"q1": 1.0, "q2": 1.0}, canary=1.0)
    new = _bench({"q1": 1.0}, canary=1.0)
    new["errors"] = {"q2": "ValueError: boom"}
    rows, flagged, _ = compare(old, new, ratio=1.5)
    assert [f[0] for f in flagged] == ["q2"]
    assert any(r[0] == "q2" and r[2] is None for r in rows)


def test_silently_vanished_query_is_flagged():
    # a query present in the old run but absent from the new one (no
    # error entry either — e.g. dropped from HEADLINE by mistake) is
    # also an infinite regression as far as the gate is concerned
    old = _bench({"q1": 1.0, "q_gone": 2.0}, canary=1.0)
    new = _bench({"q1": 1.0}, canary=1.0)
    _, flagged, _ = compare(old, new, ratio=1.5)
    assert [f[0] for f in flagged] == ["q_gone"]


def test_brand_new_query_that_errors_is_flagged():
    old = _bench({"q1": 1.0}, canary=1.0)
    new = _bench({"q1": 1.0}, canary=1.0)
    new["errors"] = {"q_fresh": "refused"}
    _, flagged, _ = compare(old, new, ratio=1.5)
    assert [f[0] for f in flagged] == ["q_fresh"]


# ---------------------------------------------------------------------------
# tolerance-mode oracle comparator (tools/oracle_check.py) — pure tests
# ---------------------------------------------------------------------------

import pandas as pd  # noqa: E402

from oracle_check import compare_frames_tolerant  # noqa: E402


def test_tolerant_match_within_band():
    s = pd.DataFrame({"seg": ["a", "b"], "est": [102, 48]})
    o = pd.DataFrame({"seg": ["a", "b"], "est": [100, 50]})
    assert compare_frames_tolerant(s, o, 0.10) == []


def test_tolerant_flags_outside_band_and_string_mismatch():
    s = pd.DataFrame({"seg": ["a", "b"], "est": [130, 50]})
    o = pd.DataFrame({"seg": ["a", "b"], "est": [100, 50]})
    assert compare_frames_tolerant(s, o, 0.10)  # 30% off -> flagged

    s2 = pd.DataFrame({"seg": ["a", "X"], "est": [100, 50]})
    o2 = pd.DataFrame({"seg": ["a", "b"], "est": [100, 50]})
    assert compare_frames_tolerant(s2, o2, 0.10)


def test_tolerant_row_count_and_columns_gate():
    s = pd.DataFrame({"seg": ["a"], "est": [100]})
    o = pd.DataFrame({"seg": ["a", "b"], "est": [100, 50]})
    assert "row count" in compare_frames_tolerant(s, o, 0.1)[0]
    o2 = pd.DataFrame({"seg": ["a"], "other": [100]})
    assert "columns" in compare_frames_tolerant(s, o2, 0.1)[0]


def test_tolerant_near_zero_uses_absolute_floor():
    # |s-o| <= rtol * max(1, |o|): tiny oracle values get an absolute
    # floor instead of an impossible relative band
    s = pd.DataFrame({"k": ["a"], "v": [0.05]})
    o = pd.DataFrame({"k": ["a"], "v": [0.0]})
    assert compare_frames_tolerant(s, o, 0.10) == []
    s2 = pd.DataFrame({"k": ["a"], "v": [0.2]})
    assert compare_frames_tolerant(s2, o, 0.10)


def test_recall_band_pass_and_floor():
    from oracle_check import compare_recall
    truth = pd.DataFrame({"vec_id": [1, 2, 3, 4, 5]})
    # 4/5 recovered = 0.8
    got = pd.DataFrame({"vec_id": [1, 2, 3, 4], "cosine_sim": [.9] * 4})
    assert compare_recall(got, truth, ("vec_id",), 0.75) == []
    assert "below pinned floor" in compare_recall(got, truth,
                                                  ("vec_id",), 0.9)[0]


def test_recall_band_over_return_and_missing_cols():
    from oracle_check import compare_recall
    truth = pd.DataFrame({"src": [1, 1], "dst": [2, 3]})
    # over-returning more ids than the truth's k-list is flagged even at
    # perfect recall (an exactness bug, not an approximation)
    got = pd.DataFrame({"src": [1, 1, 1], "dst": [2, 3, 4]})
    assert any("over-return" in p
               for p in compare_recall(got, truth, ("src", "dst"), 0.9))
    assert "missing" in compare_recall(
        pd.DataFrame({"x": [1]}), truth, ("src", "dst"), 0.9)[0]


def test_recall_band_empty_truth():
    from oracle_check import compare_recall
    empty = pd.DataFrame({"vec_id": []})
    assert compare_recall(empty, empty, ("vec_id",), 0.9) == []
    got = pd.DataFrame({"vec_id": [1]})
    assert compare_recall(got, empty, ("vec_id",), 0.9)


def test_tolerant_null_alignment():
    s = pd.DataFrame({"k": ["a"], "v": [None]})
    o = pd.DataFrame({"k": ["a"], "v": [None]})
    assert compare_frames_tolerant(s, o, 0.1) == []
    o2 = pd.DataFrame({"k": ["a"], "v": [1.0]})
    assert compare_frames_tolerant(s, o2, 0.1)


def test_containment_band_pass_and_floor():
    from oracle_check import compare_containment
    truth = pd.DataFrame({"visit_id": [1, 2, 3, 4, 5, 6, 7, 8]})
    # 4/4 flagged rows inside the superset -> containment 1.0
    got = pd.DataFrame({"visit_id": [1, 2, 3, 4, 90, 91],
                        "is_anomaly": [1, 1, 1, 1, 0, 0]})
    assert compare_containment(got, truth, ("visit_id",), 0.9,
                               "is_anomaly == 1") == []
    # 2/4 inside -> 0.5, below floor
    got2 = pd.DataFrame({"visit_id": [1, 2, 90, 91],
                         "is_anomaly": [1, 1, 1, 1]})
    assert "below pinned floor" in compare_containment(
        got2, truth, ("visit_id",), 0.9, "is_anomaly == 1")[0]


def test_containment_band_refuses_vacuous_and_missing():
    from oracle_check import compare_containment
    truth = pd.DataFrame({"visit_id": [1, 2]})
    # a model that flags NOTHING must not pass vacuously
    got = pd.DataFrame({"visit_id": [1, 2], "is_anomaly": [0, 0]})
    assert any("vacuous" in p for p in compare_containment(
        got, truth, ("visit_id",), 0.9, "is_anomaly == 1"))
    assert "missing" in compare_containment(
        pd.DataFrame({"x": [1]}), truth, ("visit_id",), 0.9,
        "is_anomaly == 1")[0]
    # a broken filter expression is a gate failure, not a crash
    assert "filter" in compare_containment(
        got, truth, ("visit_id",), 0.9, "no_such_col == 1")[0]


def test_containment_band_composite_key():
    from oracle_check import compare_containment
    truth = pd.DataFrame({"customer_id": [1, 1], "visit_id": [10, 11]})
    got = pd.DataFrame({"customer_id": [1, 1, 2],
                        "visit_id": [10, 11, 99],
                        "predicted_readmit": [1, 1, 0]})
    assert compare_containment(
        got, truth, ("customer_id", "visit_id"), 0.8,
        "predicted_readmit == 1") == []


def _bench2(queries, scan=None, shuffle=None):
    doc = {"metric": "headline_queries_total",
           "value": round(sum(queries.values()), 3),
           "queries": queries, "provenance": {}}
    if scan is not None:
        doc["provenance"]["drift_canary"] = {
            "query": "agg_by_agegroup", "sec": scan}
    if shuffle is not None:
        doc["provenance"]["drift_canary_shuffle"] = {
            "query": "skew_auto_join", "sec": shuffle}
    return doc


def test_two_canaries_geomean_scale():
    """With both the scan-bound and the shuffle-bound canary present on
    both runs (r9 item 3), the normalization factor is the geometric
    mean of the two ratios — one noisy canary no longer dominates."""
    from bench_compare import canary_scale

    # scan canary says host 2x slower, shuffle canary says 8x slower:
    # geomean = 4x. A query that ran 4x slower raw is exactly drift.
    old = _bench2({"q1": 1.0}, scan=0.5, shuffle=1.0)
    new = _bench2({"q1": 4.0}, scan=1.0, shuffle=8.0)
    s = canary_scale(old, new)
    assert abs(s - 0.25) < 1e-9  # old/new factor
    rows, flagged, normalized = compare(old, new, ratio=1.5)
    assert normalized and flagged == []
    assert abs(rows[0][4] - 1.0) < 1e-9


def test_second_canary_missing_on_one_run_degrades_to_one():
    """A run pair where only one side carries the shuffle canary must
    normalize by the scan canary alone (backward compatible with every
    pre-r10 BENCH artifact)."""
    from bench_compare import canary_scale

    old = _bench2({"q1": 1.0}, scan=0.5)
    new = _bench2({"q1": 2.0}, scan=1.0, shuffle=3.0)
    assert abs(canary_scale(old, new) - 0.5) < 1e-9
    _, flagged, normalized = compare(old, new, ratio=1.5)
    assert normalized and flagged == []


def test_subset_probe_not_flagged():
    # A deliberate subset probe (SPARK_GRAFT_BENCH_ONLY drift A/B): the
    # new run measures a small fraction of the old composition — the
    # unmeasured rows are skipped, not treated as vanished.
    old = _bench({f"q{i}": 1.0 for i in range(40)}, canary=1.0)
    new = _bench({"q0": 1.0, "q1": 1.2}, canary=1.0)
    _, flagged, _ = compare(old, new, ratio=1.5)
    assert flagged == []


def test_subset_probe_with_real_error_still_flags():
    old = _bench({f"q{i}": 1.0 for i in range(40)}, canary=1.0)
    new = _bench({"q0": 1.0}, canary=1.0)
    new["errors"] = {"q1": "OOM"}
    _, flagged, _ = compare(old, new, ratio=1.5)
    assert [f[0] for f in flagged] == ["q1"]
