"""Round-over-round bench regression check.

    python tools/bench_compare.py OLD.json NEW.json [ratio]

Accepts either raw bench.py output or the driver's BENCH_r{N}.json wrapper
(whose "tail" holds the JSON line). Flags any query slower than `ratio`×
its old time (default 1.5) and prints a sorted delta table. Exit code 1
if any flagged — usable as a gate.
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


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    flagged = []
    rows = []
    for name, t_new in new["queries"].items():
        t_old = old["queries"].get(name)
        if t_old is None:
            rows.append((name, None, t_new, None))
            continue
        r = t_new / t_old if t_old else float("inf")
        rows.append((name, t_old, t_new, r))
        if r > ratio:
            flagged.append((name, t_old, t_new, r))
    rows.sort(key=lambda x: -(x[3] or 0))
    print(f"{'query':32s} {'old':>8s} {'new':>8s} {'ratio':>6s}")
    for name, t_old, t_new, r in rows:
        print(f"{name:32s} {t_old if t_old is not None else '-':>8} "
              f"{t_new:>8} {f'{r:.2f}' if r else '-':>6}")
    print(f"\ntotal: old={old['value']} new={new['value']} "
          f"({len(flagged)} queries over {ratio}x)")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
