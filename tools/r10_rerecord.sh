#!/usr/bin/env bash
# r10_rerecord.sh — scale-curve re-record on the r10 HEAD (the cost-model
# cutover fix): BENCH_sf{0.1,1,3,10,30,60,100}.json back-to-back in one
# session class, plus the extended BENCH_stream matrix (two stateful
# probes x two scales x multi-batch — r9 verdict item 6) and the
# quality_bigram_lm sf100 audit row (item 4). Skew artifacts are NOT
# re-recorded: no skew-path code changed this round and their r9
# provenance is self-consistent.
#
# Run from a CLEAN committed tree so provenance.engine_git_sha has no
# +dirty suffix. Logs to .r10/.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p .r10 .testdata

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a .r10/chain.log; }

bench() { # sf_dir out mem
  log "bench $1 -> $2 (mem=$3)"
  SPARK_GRAFT_SF_DIR="$(realpath "$1")" SPARK_GRAFT_DRIVER_MEM="$3" \
    python bench.py 2>> .r10/chain.log | tail -1 > "$2"
  python - "$2" <<'PY' | tee -a .r10/chain.log
import json, sys
d = json.load(open(sys.argv[1]))
p = d["provenance"]
print(f"  {sys.argv[1]}: total={d['value']}s n={d['n_queries']} "
      f"errors={d['errors']} sha={p['engine_git_sha']} "
      f"canary={p['drift_canary']['sec']} "
      f"canary_shuffle={p['drift_canary_shuffle']['sec']}")
PY
}

TD=.testdata

# --- drift A/B first (r9 verdict item 3): two paired fresh-JVM subset
# runs at sf0.1, minutes apart, on the four >=1.4x-normalized r9 rows
# plus both canaries ------------------------------------------------------
AB_Q="agg_by_agegroup,skew_auto_join,returns_revenue_topk,dedup_substring_spans,dedup_embedding_topk,late_supplier_ranking"
if [ -s .r10/drift_ab_run2.json ]; then
  log "drift A/B already recorded — skipping (rm .r10/drift_ab_run*.json to redo)"
else
log "drift A/B run 1 (sf0.1 subset)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_ONLY="$AB_Q" \
  python bench.py 2>> .r10/chain.log | tail -1 > .r10/drift_ab_run1.json
sleep 180
log "drift A/B run 2 (sf0.1 subset)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_ONLY="$AB_Q" \
  python bench.py 2>> .r10/chain.log | tail -1 > .r10/drift_ab_run2.json
log "drift A/B compare (run1 vs run2, then r9 committed vs each)"
python tools/bench_compare.py .r10/drift_ab_run1.json .r10/drift_ab_run2.json 1.4 \
  > .r10/drift_ab_pair.txt || true
python tools/bench_compare.py BENCH_sf0.1.json .r10/drift_ab_run1.json 1.4 \
  > .r10/drift_ab_vs_r9_run1.txt || true
python tools/bench_compare.py BENCH_sf0.1.json .r10/drift_ab_run2.json 1.4 \
  > .r10/drift_ab_vs_r9_run2.txt || true
fi

# --- plain curve ----------------------------------------------------------
bench /root/testdata/sf0.1 BENCH_sf0.1.json 8g
bench "$TD/sf1"  BENCH_sf1.json  16g
bench "$TD/sf3"  BENCH_sf3.json  16g
bench "$TD/sf10" BENCH_sf10.json 24g
bench "$TD/sf30" BENCH_sf30.json 48g

# --- streaming matrix at sf30 (fixture still on disk) ---------------------
for P in simhash_bands user_profiles; do
  log "stream probe $P sf30 (4 batches)"
  SPARK_GRAFT_DRIVER_MEM=48g python tools/stream_scale_probe.py "$TD/sf30" \
    --probe $P --batches 4 2>> .r10/chain.log | tail -1 > ".r10/stream_${P}_sf30.json"
done

bench "$TD/sf60" BENCH_sf60.json 48g

# --- streaming matrix at sf60 ---------------------------------------------
for P in simhash_bands user_profiles; do
  log "stream probe $P sf60 (4 batches)"
  SPARK_GRAFT_DRIVER_MEM=48g python tools/stream_scale_probe.py "$TD/sf60" \
    --probe $P --batches 4 2>> .r10/chain.log | tail -1 > ".r10/stream_${P}_sf60.json"
done

python - <<'PY'
import json, subprocess
points = {}
for p in ("simhash_bands", "user_profiles"):
    for sf in ("sf30", "sf60"):
        points[f"{p}/{sf}"] = json.load(open(f".r10/stream_{p}_{sf}.json"))
sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                     capture_output=True, text=True).stdout.strip()
out = {"metric": "stateful_stream_drain_matrix", "unit": "sec",
       "points": points,
       "provenance": {"engine_git_sha": sha,
                      "tool": "tools/stream_scale_probe.py",
                      "batches_per_drain": 4,
                      "provider": "RocksDBStateStoreProvider"}}
json.dump(out, open("BENCH_stream.json", "w"), indent=1)
print("  BENCH_stream.json written (2 probes x 2 scales x 4 batches)")
PY

rm -rf "$TD/sf1" "$TD/sf3" "$TD/sf30"   # sf100 benching wants page cache + disk

# --- sf100 + the bigram sf100 audit row -----------------------------------
bench "$TD/sf100" BENCH_sf100.json 64g
log "audit sf100 (quality_bigram_lm + canary)"
SPARK_GRAFT_DRIVER_MEM=64g python tools/shuffle_audit.py "$TD/sf100" \
  quality_bigram_lm agg_by_agegroup \
  > .r10/audit_sf100_bigram.txt 2>> .r10/chain.log

log "CHAIN DONE"
