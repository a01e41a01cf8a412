"""Unit tests for tools/curve_check.py's pure comparison core (no Spark)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import curve_check as cc  # noqa: E402


def _pt(sf, queries, canary=None, canary_shuffle=None):
    prov = {}
    if canary is not None:
        prov["drift_canary"] = {"query": "agg_by_agegroup", "sec": canary}
    if canary_shuffle is not None:
        prov["drift_canary_shuffle"] = {"query": "skew_auto_join",
                                        "sec": canary_shuffle}
    return (sf, {"queries": queries, "provenance": prov})


def test_nonmonotone_flagged():
    pts = [_pt(30, {"q": 100.0}), _pt(60, {"q": 66.0})]
    nonmono, _ = cc.check(pts)
    assert [(r[0], r[1], r[2]) for r in nonmono] == [("q", 30, 60)]


def test_monotone_linear_passes():
    pts = [_pt(30, {"q": 10.0}), _pt(60, {"q": 20.0})]
    nonmono, superlin = cc.check(pts)
    assert not nonmono and not superlin


def test_subsecond_rows_ignored():
    # Both points under MIN_SEC: noise, not regime evidence.
    pts = [_pt(30, {"q": 1.5}), _pt(60, {"q": 0.9})]
    nonmono, _ = cc.check(pts)
    assert not nonmono


def test_superlinear_warned_not_failed():
    pts = [_pt(30, {"q": 10.0}), _pt(60, {"q": 50.0})]
    nonmono, superlin = cc.check(pts)
    assert not nonmono
    assert [r[0] for r in superlin] == ["q"]


def test_startup_floor_correction():
    # Canary 0.7s floor + linear data term: raw step looks sub-linear,
    # corrected step is exactly linear -> drift 1.0, no false flags.
    pts = [
        _pt(0.1, {"q": 0.8}, canary=0.71),
        _pt(10, {"q": 3.0}, canary=0.7 + 1.0),
        _pt(30, {"q": 9.0}, canary=0.7 + 3.0),
    ]
    floors = cc.canary_floors(pts)
    drift = cc.canary_drift(pts[1][1], pts[2][1], 3.0, floors)
    assert abs(drift - 1.0) < 0.02
    nonmono, superlin = cc.check(pts)
    assert not nonmono and not superlin


def test_real_host_drift_detected():
    # Canary stepped 2x the data ratio (clear of the floor): host was
    # ~2x slower at the bigger point; a 2x-data query that took 4x raw
    # is fine once normalized.
    pts = [
        _pt(0.1, {"q": 0.5}, canary=0.7),
        _pt(30, {"q": 10.0}, canary=0.7 + 4.0),
        _pt(60, {"q": 40.0}, canary=0.7 + 16.0),
    ]
    floors = cc.canary_floors(pts)
    drift = cc.canary_drift(pts[1][1], pts[2][1], 2.0, floors)
    assert abs(drift - 2.0) < 0.05
    _, superlin = cc.check(pts)
    assert not superlin


def test_geomean_over_both_canaries():
    pts = [
        _pt(0.1, {"q": 0.5}, canary=0.7, canary_shuffle=0.7),
        _pt(30, {"q": 10.0}, canary=0.7 + 4.0, canary_shuffle=0.7 + 2.0),
        _pt(60, {"q": 20.0}, canary=0.7 + 16.0, canary_shuffle=0.7 + 4.0),
    ]
    floors = cc.canary_floors(pts)
    # scan canary corrected step 4.0 (drift 2.0), shuffle canary 2.0
    # (drift 1.0) -> geomean sqrt(2) ~ 1.414
    drift = cc.canary_drift(pts[1][1], pts[2][1], 2.0, floors)
    assert abs(drift - 2.0 ** 0.5) < 0.05
