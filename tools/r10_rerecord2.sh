#!/usr/bin/env bash
# r10_rerecord2.sh — re-record ONLY the sf60 and sf100 points, back to
# back in one session window, on the post-retry-fix HEAD:
#   - the chain's sf60 point landed in a measurably slow host window
#     (scan canary 13.3 s vs 19.7 at sf100 for 1.67x the data; three
#     queries read non-monotone sf60->sf100 purely from that), and
#   - the chain's sf100 point lost dedup_embedding_topk to a one-off
#     Python-worker crash that local[N,3] now absorbs.
# Run from a CLEAN committed tree. Logs to .r10/.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p .r10

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a .r10/chain2.log; }

bench() { # sf_dir out mem
  log "bench $1 -> $2 (mem=$3)"
  SPARK_GRAFT_SF_DIR="$(realpath "$1")" SPARK_GRAFT_DRIVER_MEM="$3" \
    python bench.py 2>> .r10/chain2.log | tail -1 > "$2"
  python - "$2" <<'PY' | tee -a .r10/chain2.log
import json, sys
d = json.load(open(sys.argv[1]))
p = d["provenance"]
print(f"  {sys.argv[1]}: total={d['value']}s n={d['n_queries']} "
      f"errors={d['errors']} sha={p['engine_git_sha']} "
      f"canary={p['drift_canary']['sec']} "
      f"canary_shuffle={p['drift_canary_shuffle']['sec']}")
PY
}

bench .testdata/sf60  BENCH_sf60.json  48g
bench .testdata/sf100 BENCH_sf100.json 64g
log "RERECORD2 DONE"
