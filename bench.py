"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the distributed noop sink
(``write.format("noop")``): every operator in the plan executes on the
executors exactly as a real sink would drive it, but nothing is shipped
to the Python driver — so timings measure Catalyst planning + engine
execution, not py4j row serialization (collect() on a row-per-input
query like window_patient_features at sf1 spends ~7s of its 8.7s moving
1.5M rows into the driver process, drowning the 1.4s of engine work the
benchmark exists to track). Session startup is excluded.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _read_json(path: str):
    with open(path) as fh:
        return json.load(fh)


def _git_sha() -> str:
    """HEAD sha of the repo this bench ran from, '+dirty' when ENGINE
    files differ from it. The flag exists to catch engine-code drift,
    not a measurement round's own outputs landing on disk — so instead
    of excluding an ever-growing list of artifacts (BENCH_*, docs/*,
    LEAKCHECK, VERDICT...), the status check is RESTRICTED to the paths
    whose drift would invalidate a measurement: the engine package, the
    entry module, bench itself, and tools/."""
    import subprocess
    try:
        sha = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip()
        if not sha:
            return "unknown"
        dirty = subprocess.run(
            ["git", "-C", REPO, "status", "--porcelain",
             "--untracked-files=no", "--",
             ":(top)healthcare_data_warehouse_spark/",
             ":(top)__spark_entry__.py",
             ":(top)bench.py",
             ":(top)tools/",
             ":(top)tests/"],
            capture_output=True, text=True, timeout=10).stdout.strip()
        return sha + ("+dirty" if dirty else "")
    except Exception:  # noqa: BLE001 — provenance must not kill a bench
        return "unknown"

HEADLINE = [
    "agg_by_agegroup",
    "join_3way",
    # round-5: the bucketed-layout variant of join_3way (zero-exchange
    # fact join off the ingest-time bucketed tables; its first timed run
    # pays the one-off layout build, min-of-2 reports the steady state)
    "join_3way_bucketed",
    "join_fact_dims",
    "agg_monthly_trend",
    "percentile_p90",
    "topk_highcost",
    "window_patient_features",
    "window_rownumber_keys",
    "case_visit_cohorts",
    "union_dq_report",
    # Heaviest beyond-§2 ops (LLM-pipeline + streaming batch-twin), so
    # round-over-round perf on them is tracked (VERDICT r01 item 8):
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "stream_hourly_agg",
    "trend_slope_per_customer",
    # round-2 additions (blocked pair scoring + curation pipeline):
    "dedup_embedding_cosine",
    "corpus_clean",
    # round-2 additions (warehouse + corpus breadth): sketch heavy
    # hitters, event analytics, one-pass profiling, PII scrub, mergeable
    # partial aggregation:
    "token_heavy_hitters",
    "cohort_retention",
    "funnel_dropoff",
    "profile_lineitem",
    "text_redact_pii",
    "agg_incremental_merge",
    # round-2 session-3 additions (chunking fan-out, CDC full-outer diff,
    # bigram vocabulary aggregate):
    "chunk_documents",
    "cdc_orders_diff",
    "vocab_bigrams",
    # round-2 session-4 additions (bigram-LM scoring over the corpus,
    # windowed trending top-k — the heaviest of the newest ops):
    "quality_bigram_lm",
    "stream_trending_topk",
    # round-2 session-5 additions (deepest join tree in the catalog, and
    # the one-scan Q21 multi-semijoin rewrite):
    "market_share_by_year",
    "late_supplier_ranking",
    # round-2 session-6 additions (Q5's local-commerce star, Q7's
    # bilateral symmetric-OR, Q10's grouped top-k):
    "regional_nation_revenue",
    "bilateral_trade_volume",
    "returns_revenue_topk",
    # round-2 session-6 retrieval + blocking additions (the heaviest of
    # the newest ops - complete rare-feature candidate generation and
    # the two-ranker hybrid stack):
    "dedup_rare_shingle_pairs",
    "bm25_topk",
    "hybrid_search_rrf",
    "session_paths",
    # round-3 additions (span-level dedup + the corpus-wide tokenizer
    # readout — the two heaviest new hash-certified ops):
    "dedup_substring_spans",
    "vocab_bpe_segment",
    # round-6 additions: the linear-output embedding top-k (now with
    # oversized-block IVF routing — the regime stamp shows which path
    # ran at each SF) and the bulk approximate k-NN join it routes to:
    "dedup_embedding_topk",
    "ann_knn_join",
    # round-7 addition: the skew-adaptive fact⋈fact join — its stamped
    # auto_join[o_orderkey] regime shows plain_broadcast at gate scales,
    # plain_aqe_skewjoin on the Zipf sf10skew fixture (AQE hot-partition
    # split, measured 1.8x better than unhandled and ~equal to salting
    # at 1/13th the replication), and salted:N on AQE-less sessions:
    "skew_auto_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # tolerate variant suffixes ("sf10skew" -> 10.0): the numeric part is
    # the scale; the full dir name still lands in provenance via sf_dir
    import re as _re

    _m = _re.match(r"sf([0-9.]+)", os.path.basename(sf_dir.rstrip("/")))
    sf = float(_m.group(1)) if _m else 0.1

    # Triage subset: SPARK_GRAFT_BENCH_ONLY="q1,q2" times just those
    # headline queries (full-list totals are NOT comparable to a subset
    # run — use for before/after deltas on individual queries only).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    if only.strip():
        wanted = {s.strip() for s in only.split(",") if s.strip()}
        unknown = sorted(wanted - set(HEADLINE))
        if unknown:
            sys.exit(
                "SPARK_GRAFT_BENCH_ONLY names not in HEADLINE: "
                + ", ".join(unknown)
                + "\nvalid: " + ", ".join(HEADLINE)
            )
        headline = [q for q in HEADLINE if q in wanted]
    else:
        headline = HEADLINE

    import __spark_entry__ as entrymod
    from healthcare_data_warehouse_spark.session import get_spark

    spark = get_spark("hdw-bench")
    qs = entrymod.queries()

    # Warm-up: run every headline query once at the smallest SF so JIT,
    # codegen compilation, and shuffle machinery are hot before timing
    # (standard steady-state benchmarking; data at the target SF is only
    # touched by the timed runs below, after a footer-only warm).
    def run(name: str, d: str) -> None:
        df = qs[name](spark, d)
        assert df.columns  # schema resolved; noop executes the full plan
        df.write.format("noop").mode("overwrite").save()

    # The explicit JVM GC below costs ~30 ms per call — worth it only
    # when the run is big enough to age the heap (measured: saves 100+ s
    # at sf30, costs ~1 s total at sf0.1 where nothing accumulates).
    # os.walk, not listdir: Spark-style parquet DIRECTORIES (part files
    # under <table>.parquet/) must count toward the size heuristic and
    # get page-cache warmed too, or `heavy` underestimates and the warm
    # silently skips them, reintroducing the cold-scan smear.
    def _sf_files(d: str) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(d):
            out.extend(os.path.join(root, f) for f in files)
        return sorted(out)

    sf_files = _sf_files(sf_dir)
    sf_bytes = sum(os.path.getsize(p) for p in sf_files)
    # r10: the explicit JVM GC between queries is now UNCONDITIONAL.
    # Three back-to-back r10 sf0.1 runs each showed a DIFFERENT band of
    # 3-6 CONSECUTIVE queries spiking 3-10x (ann_knn_join 1.6/16.8/
    # 5.8 s, same stamped plan and data). A -Xlog:gc run settled the
    # cause: NOT the JVM (full GCs were ~150 ms over a <1 GB live set,
    # and the spikes persisted with per-query System.gc()) — they are
    # multi-second HOST slow-windows, the same 2-4x weather r9
    # documented, hitting whichever queries run inside them. The
    # per-query GC stays anyway: it runs OUTSIDE the timed region,
    # costs ~150 ms/query untimed, and at big SF it is the measured
    # 100+ s old-gen fix; min-of-2 per query plus cross-run minima
    # (tools/bench_compare.py) are the honest answer to the weather.
    # The flag is kept only for the provenance stamp.
    heavy = sf_bytes > 256 << 20

    def release_blocks() -> None:
        if os.environ.get("SPARK_GRAFT_NO_RELEASE"):  # A/B escape hatch
            return
        # Queries here are independent, so any block a query pinned
        # (persist for two-pass key numbering, localCheckpoint for
        # lineage truncation) is garbage once it returns — but the JVM
        # only reaps those blocks after Python GC drops the py4j refs
        # and ContextCleaner runs. Over a long multi-query run at big SF
        # the leftovers age the old-gen and late queries pay 2-3x in GC,
        # so evict explicitly between queries (outside the timed region).
        gc.collect()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(True)  # blocking: async removal would race
            # the NEXT query's timed region for CPU and block-manager
            # locks (measured as 2-4x outliers on random queries)
        spark.catalog.clearCache()
        # Broadcast variables and per-query shuffle state are reaped by
        # ContextCleaner only after a JVM GC enqueues their weak refs,
        # and spark.cleaner.periodicGC.interval defaults to 30 MINUTES —
        # far longer than a whole bench run, so in local mode they pile
        # up in the driver JVM's old-gen (measured: 2-3x drag with
        # GCLocker retry warnings on late-run queries at sf30). One
        # explicit full GC per query keeps the JVM young.
        spark.sparkContext._jvm.System.gc()

    for name in headline:
        run(name, "/root/testdata/sf0.001")
        release_blocks()
    # Ingest-time layouts build OUTSIDE the timed region: the bucketed
    # order tables are written once at ingest in production and amortized
    # over every order-grained query, so timing the build inside run 1
    # would charge a layout decision to a query. (The ANN index caches
    # get the same treatment implicitly — they persist across runs and
    # min-of-2 reports the steady state.)
    if "join_3way_bucketed" in headline:
        from healthcare_data_warehouse_spark.sources.bucketing import (
            ensure_order_bucketed_layout)

        ensure_order_bucketed_layout(spark, sf_dir)
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    # Page-cache warm of the target SF: without it, whichever query
    # FIRST touches each table pays its cold disk read — at sf30 that
    # smears 2-4x onto a handful of run-order-dependent queries and
    # makes records incomparable across runs (the cache state depended
    # on whether the data had just been generated). Steady-state
    # engine time is what this benchmark tracks; cold-scan behavior is
    # a property of the storage tier, not the query plans.
    for p in sf_files:
        with open(p, "rb") as fh:
            while fh.read(1 << 24):
                pass

    from healthcare_data_warehouse_spark import decisions as _decisions

    def _err_summary(exc: Exception) -> str:
        # surface the ROOT message (a guard's ValueError sits deep inside
        # the Py4J wrapper text), not the 50-line Java stack preamble
        s = str(exc)
        for line in s.splitlines():
            if ("Error:" in line or "Exception:" in line) and \
                    not line.lstrip().startswith(("An error", "py4j", "at ")):
                return line.strip()[:300]
        return f"{type(exc).__name__}: {s[:200]}"

    _decisions.drain()  # discard warm-up decisions; stamp only timed ones
    timings: dict[str, float] = {}
    regimes: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name in headline:
        best = float("inf")
        try:
            for _ in range(2):  # min-of-2: steady-state, robust to noise
                t0 = time.perf_counter()
                run(name, sf_dir)
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001 — one query must not
            # zero out a 40-minute curve point; record WHY and continue
            # (a guard refusing an oversized block at a big SF is a
            # documented contract, and the artifact should show it)
            errors[name] = _err_summary(exc)
        # Plan-regime stamp: size-gated operators log which physical
        # strategy they chose (see decisions.py); recording it beside
        # the wall time makes the artifact self-evident — a slow
        # join_3way row now SAYS whether the staged plan ran or the
        # cutover failed to engage, instead of leaving it to forensics.
        drained = _decisions.drain()
        for qname, facts in drained.items():
            regimes.setdefault(name if qname == "<anonymous>" else qname,
                               {}).update(facts)
        release_blocks()

    total = round(sum(timings.values()), 3)
    # n_queries makes composition changes visible: cross-round totals are
    # only apples-to-apples when n_queries matches (new headline queries
    # inflate the total; compare per-query or same-composition subtotals).
    # provenance: the run conditions that round-over-round comparisons
    # need — this host drifts 2-4x hour-to-hour, so a number without its
    # conditions (and the agg_by_agegroup drift canary, re-timeable in
    # seconds via SPARK_GRAFT_BENCH_ONLY) is unreadable later.
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "n_queries": len(timings),
        "errors": errors,  # {} normally; query -> root message on failure
        "sf": sf,
        "regimes": regimes,
        "provenance": {
            "sf_dir": os.path.basename(sf_dir.rstrip("/")),
            "fresh_jvm": True,  # this harness always builds its own session
            "page_cache_warmed": True,
            "heavy_gc_mode": bool(heavy),
            "sf_bytes": sf_bytes,
            "runs_per_query": 2,
            "aggregation": "min",
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
            "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", ""),
            "drift_canary": {"query": "agg_by_agegroup",
                             "sec": timings.get("agg_by_agegroup")},
            # Second canary, SHUFFLE-bound (r9 verdict item 3): the
            # scan-bound agg canary alone cannot normalize per-query
            # noise on shuffle-heavy rows — the r9 round-over-round
            # call was ambiguous exactly because one sub-second canary
            # dominated the normalization. skew_auto_join is the
            # fact⋈fact sort-merge + aggregate: its wall tracks shuffle
            # machinery (exchange write/read, sort buffers), the other
            # half of this host's drift. bench_compare geomeans both.
            "drift_canary_shuffle": {"query": "skew_auto_join",
                                     "sec": timings.get("skew_auto_join")},
            # Engine identity: BENCH artifacts are only evidence about
            # the code that produced them — r8's committed scale curve
            # silently predated two headline plan fixes because nothing
            # tied artifact to commit. A SHA (+dirty flag when the tree
            # has uncommitted engine changes) makes staleness a
            # one-diff catch.
            "engine_git_sha": _git_sha(),
            # seeded skew fixtures carry a generator manifest with the
            # content md5 of the rewritten tables — stamped here so the
            # skew A/B evidence stays pinned to a reproducible fixture
            # (regenerate via tools/make_skew_data.py and diff the hash)
            **({"skew_fixture": _read_json(
                os.path.join(sf_dir, "_skew_manifest.json"))}
               if os.path.exists(os.path.join(sf_dir, "_skew_manifest.json"))
               else {}),
            # scaled fixtures carry the same content-md5 discipline
            # (tools/make_scale_data.py) — a curve point names the exact
            # fixture bytes it was timed on
            **({"scale_fixture": _read_json(
                os.path.join(sf_dir, "_scale_manifest.json"))}
               if os.path.exists(os.path.join(sf_dir, "_scale_manifest.json"))
               else {}),
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
