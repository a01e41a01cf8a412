"""Round-over-round bench regression check, drift-canary normalized.

    python tools/bench_compare.py OLD.json NEW.json [ratio]

Accepts either raw bench.py output or the driver's BENCH_r{N}.json wrapper
(whose "tail" holds the JSON line). This host's absolute throughput
drifts 2-4x hour-to-hour (docs/RUNBOOK.md), so raw wall-time ratios flag
weather, not plans: when BOTH runs carry a ``provenance.drift_canary``
block (bench.py stamps one per run — the same fixed query timed under
the same harness), each side's per-query time is divided by its run's
canary seconds first, and the flag threshold applies to the NORMALIZED
ratio. Runs without a canary fall back to raw comparison (and say so).

Flags any query slower than `ratio`x its old (normalized) time
(default 1.5) and prints a sorted delta table with both raw and
normalized ratios. Exit code 1 if any flagged — usable as a gate.
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc
    # driver wrapper: find the JSON line inside "tail"
    m = re.search(r'\{"metric".*\}', doc.get("tail", ""))
    if not m:
        raise SystemExit(f"{path}: no bench JSON found")
    return json.loads(m.group(0))


def canary_sec(doc: dict) -> float | None:
    sec = ((doc.get("provenance") or {}).get("drift_canary") or {}).get("sec")
    return float(sec) if sec else None


def canary_scale(old: dict, new: dict) -> float | None:
    """Host-speed factor old/new from the drift canaries, or None when
    either run lacks one. When BOTH runs carry the second (shuffle-bound)
    canary (r9 item 3: one sub-second scan canary cannot normalize
    per-query noise on shuffle-heavy rows), the factor is the GEOMETRIC
    MEAN of the two canaries' ratios — scan-bound and shuffle-bound
    drift move independently on this host, and the geomean keeps one
    noisy canary from dominating the round-over-round call."""
    import math

    ratios = []
    for key in ("drift_canary", "drift_canary_shuffle"):
        o = ((old.get("provenance") or {}).get(key) or {}).get("sec")
        n = ((new.get("provenance") or {}).get(key) or {}).get("sec")
        if o and n:
            ratios.append(float(o) / float(n))
    if not ratios:
        return None
    return math.exp(sum(math.log(r) for r in ratios) / len(ratios))


def compare(old: dict, new: dict, ratio: float = 1.5):
    """Pure comparison core (pytest-able): returns (rows, flagged,
    normalized?) where rows are (name, t_old, t_new, raw_ratio,
    norm_ratio) and flagging uses norm_ratio when both runs carry a
    drift canary, raw_ratio otherwise."""
    s = canary_scale(old, new)
    normalized = s is not None
    scale = s if normalized else 1.0
    flagged, rows = [], []
    for name, t_new in new["queries"].items():
        t_old = old["queries"].get(name)
        if t_old is None:
            rows.append((name, None, t_new, None, None))
            continue
        raw = t_new / t_old if t_old else float("inf")
        norm = raw * scale if normalized else None
        rows.append((name, t_old, t_new, raw, norm))
        if (norm if normalized else raw) > ratio:
            flagged.append((name, t_old, t_new, raw, norm))
    # A query that regressed to FAILURE (bench.py records it under
    # "errors" and drops it from "queries") or silently vanished from the
    # new run must not slip past the gate just because there is no timing
    # to ratio: treat both as infinitely-regressed and flag them.
    # EXCEPT when the new run is a deliberate subset probe
    # (SPARK_GRAFT_BENCH_ONLY — the per-query drift-A/B workflow the
    # RUNBOOK prescribes): comparing a 6-query probe against a full
    # 42-query record used to flag the 36 unmeasured rows as ERROR and
    # exit 1, making the gate useless for exactly the comparison the
    # tool exists for. Missing >25% of the old composition AND at least
    # 5 queries means "subset" (one or two vanished rows in a
    # same-composition comparison still flag), and unmeasured rows are
    # then skipped silently (real errors in the new run still flag).
    new_errors = new.get("errors") or {}
    missing = [n for n in old["queries"]
               if n not in new["queries"] and n not in new_errors]
    subset_probe = (len(missing) >= 5
                    and len(missing) > 0.25 * len(old["queries"]))
    for name, t_old in old["queries"].items():
        if name in new["queries"] or (subset_probe and name in missing):
            continue
        inf = float("inf")
        rows.append((name, t_old, None, inf, inf if normalized else None))
        flagged.append((name, t_old, None, inf, inf if normalized else None))
    for name in new_errors:
        if name not in old["queries"]:  # new query that errored: still flag
            inf = float("inf")
            rows.append((name, None, None, inf, inf if normalized else None))
            flagged.append((name, None, None, inf,
                            inf if normalized else None))
    rows.sort(key=lambda x: -((x[4] if x[4] is not None else x[3]) or 0))
    return rows, flagged, normalized


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    rows, flagged, normalized = compare(old, new, ratio)
    if normalized:
        s = canary_scale(old, new)
        n_can = sum(
            1 for key in ("drift_canary", "drift_canary_shuffle")
            if ((old.get("provenance") or {}).get(key) or {}).get("sec")
            and ((new.get("provenance") or {}).get(key) or {}).get("sec"))
        print(f"canary scale old/new={s:.3f} ({n_can} canar"
              f"{'ies, geomean' if n_can > 1 else 'y'}; scan "
              f"old={canary_sec(old)}s new={canary_sec(new)}s; "
              "flagging on NORMALIZED ratio)")
    else:
        print("no drift canary on one/both runs — flagging on RAW ratio")
    print(f"{'query':32s} {'old':>8s} {'new':>8s} {'raw':>6s} {'norm':>6s}")
    for name, t_old, t_new, raw, norm in rows:
        print(f"{name:32s} {t_old if t_old is not None else '-':>8} "
              f"{t_new if t_new is not None else 'ERROR':>8} "
              f"{f'{raw:.2f}' if raw else '-':>6} "
              f"{f'{norm:.2f}' if norm is not None else '-':>6}")
    new_errors = new.get("errors") or {}
    unmeasured = [n for n in old["queries"]
                  if n not in new["queries"] and n not in new_errors]
    if len(unmeasured) >= 5 and len(unmeasured) > 0.25 * len(old["queries"]):
        print(f"\nsubset probe: {len(unmeasured)} of "
              f"{len(old['queries'])} old queries not measured "
              "(skipped, not flagged)")
    print(f"\ntotal: old={old['value']} new={new['value']} "
          f"({len(flagged)} queries over {ratio}x"
          f"{' canary-normalized' if normalized else ''})")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
