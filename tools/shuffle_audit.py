"""Measure, don't guess: per-query shuffle/broadcast volume audit.

Executes every bench HEADLINE query at a given SF and walks the final
adaptive physical plan's SQLMetrics, summing shuffle bytes written,
records shuffled, and broadcast build sizes. Writes docs/SHUFFLES.md —
the table a reviewer reads to see whether an operator's shuffle volume
is proportional to its semantics (pair counts, aggregate sizes) or to
raw input (a missing pushdown/partial-agg).

    python tools/shuffle_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _walk(node, out):
    out.append(node)
    name = node.getClass().getSimpleName()
    # Query stages are leaves whose materialized subtree hangs off .plan()
    if "QueryStage" in name:
        _walk(node.plan(), out)
        return
    if "WholeStageCodegen" in name or "InputAdapter" in name:
        pass  # normal children traversal covers codegen wrappers
    ch = node.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), out)


def _metrics(node) -> dict[str, int]:
    vals = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        vals[kv._1()] = kv._2().value()
    return vals


def audit_query(df) -> dict[str, int]:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    if "AdaptiveSparkPlan" in plan.getClass().getName():
        plan = plan.finalPhysicalPlan()
    nodes: list = []
    _walk(plan, nodes)
    shuffle_bytes = shuffle_records = broadcast_bytes = n_exchanges = 0
    spill_bytes = sort_aggs = sorts = 0
    for n in nodes:
        nm = n.getClass().getSimpleName()
        m = _metrics(n)
        if "ShuffleExchange" in nm:
            n_exchanges += 1
            shuffle_bytes += m.get("shuffleBytesWritten", 0)
            shuffle_records += m.get("shuffleRecordsWritten", 0)
        elif "BroadcastExchange" in nm:
            broadcast_bytes += m.get("dataSize", 0)
        # the r8 lesson: a var-len aggregation buffer silently demotes
        # HashAggregate to SortAggregate — an n·log n CPU tax that never
        # shows in exchange metrics. Count them so the audit catches it.
        elif nm.startswith("SortAggregate"):
            sort_aggs += 1
        elif nm == "SortExec":
            sorts += 1
        # spill shows up on sorts/aggregates/joins under memory pressure
        spill_bytes += m.get("spillSize", 0)
    return {
        "exchanges": n_exchanges,
        "shuffle_mb": round(shuffle_bytes / 1e6, 3),
        "shuffle_records": shuffle_records,
        "broadcast_mb": round(broadcast_bytes / 1e6, 3),
        "spill_mb": round(spill_bytes / 1e6, 3),
        "sort_aggs": sort_aggs,
        "sorts": sorts,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # Optional query names after sf_dir: audit just those and print the
    # table to stdout (docs/SHUFFLES.md stays the full-sf0.1 record).
    subset = sys.argv[2:]

    import bench
    import __spark_entry__ as entrymod
    from healthcare_data_warehouse_spark.session import get_spark

    spark = get_spark("hdw-shuffle-audit")
    qs = entrymod.queries()

    rows = []
    for name in subset or bench.HEADLINE:
        try:
            t0 = time.monotonic()
            m = audit_query(qs[name](spark, sf_dir))
            m["wall_s"] = round(time.monotonic() - t0, 2)
            rows.append((name, m))
        except Exception as e:  # never lose the whole audit to one query
            print(f"[skip] {name}: {e}", file=sys.stderr)

    if subset:
        print("| query | exchanges | shuffle MB | shuffle records "
              "| broadcast MB | spill MB | sortAggs | sorts | wall s |")
        for name, m in rows:
            print(f"| {name} | {m['exchanges']} | {m['shuffle_mb']} "
                  f"| {m['shuffle_records']} | {m['broadcast_mb']} "
                  f"| {m['spill_mb']} | {m['sort_aggs']} | {m['sorts']} "
                  f"| {m['wall_s']} |")
        spark.stop()
        return

    lines = [
        "# SHUFFLES — measured shuffle/broadcast volume per headline query",
        "",
        f"`python tools/shuffle_audit.py {sf_dir}` — SQLMetrics from the final",
        "adaptive plan of one execution. Shuffle MB is the sum over every",
        "ShuffleExchange (map-side combined, compressed); broadcast MB is the",
        "sum of build-side estimated sizes. The number to watch is shuffle",
        "volume vs the operator's OUTPUT semantics: an aggregate that",
        "shuffles its input instead of its partial aggregates, or a filter",
        "that shuffles pre-filter rows, shows up here before it shows up in",
        "wall clock at 100 TB.",
        "",
        "| query | exchanges | shuffle MB | shuffle records | broadcast MB | spill MB | sortAggs | sorts |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, m in rows:
        lines.append(
            f"| {name} | {m['exchanges']} | {m['shuffle_mb']} "
            f"| {m['shuffle_records']} | {m['broadcast_mb']} "
            f"| {m['spill_mb']} | {m['sort_aggs']} | {m['sorts']} |")
    out = os.path.join(REPO, "docs", "SHUFFLES.md")
    # Replace only the header+table; everything from the first "## "
    # section on is hand-written measurement narrative — preserve it.
    tail = ""
    if os.path.exists(out):
        with open(out) as f:
            prev = f.read()
        idx = prev.find("\n## ")
        if idx != -1:
            tail = prev[idx:]
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n" + tail)
    print(f"wrote {out} ({len(rows)} queries, narrative preserved)")
    spark.stop()


if __name__ == "__main__":
    main()
