#!/usr/bin/env bash
# r9_rerecord.sh — one-session scale-curve re-record on HEAD (r8 verdict
# items 1/5/6/7): regenerates every scale fixture deterministically,
# re-records BENCH_sf{1,3,10,30,60,100}.json + BENCH_sf{10,30}skew.json +
# BENCH_stream.json back-to-back with engine-SHA + fixture-manifest
# provenance, and captures the SortAggregate-aware shuffle audits for the
# three last-unaudited ≥1.7×-step queries (verdict item 3) while the
# sf30/sf60 fixtures exist. Disk-aware: skew fixtures are deleted after
# their records, sf30 after sf60 is generated (33 GB budget).
#
# Run from a CLEAN committed tree so provenance.engine_git_sha has no
# +dirty suffix. Logs to .r9/.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p .r9 .testdata

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a .r9/chain.log; }

gen() { # src dest k
  log "gen $2 (src=$1 k=$3)"
  python tools/make_scale_data.py "$1" "$2" "$3" >> .r9/chain.log 2>&1
}

bench() { # sf_dir out mem
  log "bench $1 -> $2 (mem=$3)"
  SPARK_GRAFT_SF_DIR="$PWD/$1" SPARK_GRAFT_DRIVER_MEM="$3" \
    python bench.py 2>> .r9/chain.log | tail -1 > "$2"
  python - "$2" <<'PY' | tee -a .r9/chain.log
import json, sys
d = json.load(open(sys.argv[1]))
print(f"  {sys.argv[1]}: total={d['value']}s n={d['n_queries']} "
      f"errors={d['errors']} sha={d['provenance']['engine_git_sha']} "
      f"canary={d['provenance']['drift_canary']['sec']}")
PY
}

SRC=/root/testdata/sf0.1
TD=.testdata

# --- plain curve fixtures ---------------------------------------------
gen "$SRC"      "$TD/sf1"  10
gen "$TD/sf1"   "$TD/sf3"  3
gen "$TD/sf1"   "$TD/sf10" 10

bench "$TD/sf1"  BENCH_sf1.json  16g
bench "$TD/sf3"  BENCH_sf3.json  16g
bench "$TD/sf10" BENCH_sf10.json 24g

# --- sf10 skew record + A/B, then reclaim the disk --------------------
log "gen sf10skew"
python tools/make_skew_data.py "$TD/sf10" "$TD/sf10skew" >> .r9/chain.log 2>&1
bench "$TD/sf10skew" BENCH_sf10skew.json 24g
log "skew_ab sf10skew"
SPARK_GRAFT_DRIVER_MEM=24g python tools/skew_ab.py "$TD/sf10skew" \
  > .r9/skew_ab_sf10.txt 2>> .r9/chain.log
rm -rf "$TD/sf10skew"

# --- sf30: bench + streaming probes + SortAgg-aware audits ------------
gen "$TD/sf10" "$TD/sf30" 3
bench "$TD/sf30" BENCH_sf30.json 48g

log "stream probe sf10"
SPARK_GRAFT_DRIVER_MEM=24g python tools/stream_scale_probe.py "$TD/sf10" \
  2>> .r9/chain.log | tail -1 > .r9/stream_sf10.json
log "stream probe sf30"
SPARK_GRAFT_DRIVER_MEM=48g python tools/stream_scale_probe.py "$TD/sf30" \
  2>> .r9/chain.log | tail -1 > .r9/stream_sf30.json
python - <<'PY'
import json
out = {"metric": "stream_simhash_band_registry_drain", "unit": "sec",
       "points": {sf: json.load(open(f".r9/stream_{sf}.json"))
                  for sf in ("sf10", "sf30")}}
sha = __import__("subprocess").run(
    ["git", "rev-parse", "--short", "HEAD"],
    capture_output=True, text=True).stdout.strip()
out["provenance"] = {"engine_git_sha": sha,
                     "tool": "tools/stream_scale_probe.py"}
json.dump(out, open("BENCH_stream.json", "w"), indent=1)
print("  BENCH_stream.json written")
PY

log "audit sf30 (item-3 queries + canary)"
SPARK_GRAFT_DRIVER_MEM=48g python tools/shuffle_audit.py "$TD/sf30" \
  quality_bigram_lm market_share_by_year dedup_substring_spans \
  agg_by_agegroup dedup_embedding_cosine late_supplier_ranking \
  > .r9/audit_sf30.txt 2>> .r9/chain.log

# --- sf30 skew record + A/B, then reclaim ------------------------------
log "gen sf30skew"
python tools/make_skew_data.py "$TD/sf30" "$TD/sf30skew" >> .r9/chain.log 2>&1
bench "$TD/sf30skew" BENCH_sf30skew.json 48g
log "skew_ab sf30skew"
SPARK_GRAFT_DRIVER_MEM=48g python tools/skew_ab.py "$TD/sf30skew" \
  > .r9/skew_ab_sf30.txt 2>> .r9/chain.log
rm -rf "$TD/sf30skew"

# --- sf60 ---------------------------------------------------------------
gen "$TD/sf30" "$TD/sf60" 2
bench "$TD/sf60" BENCH_sf60.json 48g

log "audit sf60 (item-3 queries + canary)"
SPARK_GRAFT_DRIVER_MEM=48g python tools/shuffle_audit.py "$TD/sf60" \
  quality_bigram_lm market_share_by_year dedup_substring_spans \
  agg_by_agegroup dedup_embedding_cosine late_supplier_ranking \
  > .r9/audit_sf60.txt 2>> .r9/chain.log

rm -rf "$TD/sf30"   # sf100 needs the headroom

# --- sf100 --------------------------------------------------------------
gen "$TD/sf10" "$TD/sf100" 10
bench "$TD/sf100" BENCH_sf100.json 64g

log "CHAIN DONE"
