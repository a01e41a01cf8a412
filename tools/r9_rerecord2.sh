#!/usr/bin/env bash
# r9_rerecord2.sh — second plain-curve re-record, on the SHA that carries
# the round-9 plan fixes (Q8 semi-reduction, size-aware spread width).
# The first chain (tools/r9_rerecord.sh) recorded the full set — plain
# curve, skew points, stream probes, audits — on the pre-fix SHA and
# surfaced the two problems; this chain replaces ONLY the plain-curve
# artifacts so every committed BENCH_sf{1,3,10,30,60,100}.json carries
# the fixes it claims (r8 verdict item 1's discipline). Skew + stream
# artifacts keep their own self-consistent provenance.
#
# Reuses on-disk fixtures where they exist; regenerates sf30 (deleted by
# chain 1 for disk) before sf100 benching needs the space back.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p .r9

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a .r9/chain2.log; }

bench() { # sf_dir out mem
  log "bench $1 -> $2 (mem=$3)"
  SPARK_GRAFT_SF_DIR="$PWD/$1" SPARK_GRAFT_DRIVER_MEM="$3" \
    python bench.py 2>> .r9/chain2.log | tail -1 > "$2"
  python - "$2" <<'PY' | tee -a .r9/chain2.log
import json, sys
d = json.load(open(sys.argv[1]))
print(f"  {sys.argv[1]}: total={d['value']}s n={d['n_queries']} "
      f"errors={d['errors']} sha={d['provenance']['engine_git_sha']} "
      f"canary={d['provenance']['drift_canary']['sec']}")
PY
}

TD=.testdata

bench "$TD/sf1"  BENCH_sf1.json  16g
bench "$TD/sf3"  BENCH_sf3.json  16g
rm -rf "$TD/sf1" "$TD/sf3"

if [ ! -d "$TD/sf30" ]; then
  log "regen sf30 (deterministic: same bytes as chain-1 manifest)"
  python tools/make_scale_data.py "$TD/sf10" "$TD/sf30" 3 >> .r9/chain2.log 2>&1
fi
bench "$TD/sf30" BENCH_sf30.json 48g

bench "$TD/sf10" BENCH_sf10.json 24g
bench "$TD/sf60" BENCH_sf60.json 48g

# paired post-fix evidence for the two repaired queries, same session,
# fixtures still warm (goes to SHUFFLES.md narrative)
log "audit sf60 post-fix (Q8 + spans + canary)"
SPARK_GRAFT_DRIVER_MEM=48g python tools/shuffle_audit.py "$TD/sf60" \
  market_share_by_year dedup_substring_spans agg_by_agegroup \
  > .r9/audit_sf60_postfix.txt 2>> .r9/chain2.log
log "audit sf30 post-fix (Q8 + spans + canary)"
SPARK_GRAFT_DRIVER_MEM=48g python tools/shuffle_audit.py "$TD/sf30" \
  market_share_by_year dedup_substring_spans agg_by_agegroup \
  > .r9/audit_sf30_postfix.txt 2>> .r9/chain2.log

rm -rf "$TD/sf30"
bench "$TD/sf100" BENCH_sf100.json 64g

log "CHAIN2 DONE"
