#!/usr/bin/env bash
# r11_ab_chain.sh — the round's interleaved A/B evidence, run on an idle
# box (each probe is same-session interleaved; see tools/ab_r11.py).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .r11

# fixture integrity: verify regenerated content md5s match the manifest
python - <<'PY' > .r11/fixture_md5_check.txt 2>&1
import hashlib, json, os
for sf in ("sf30", "sf60"):
    d = f".testdata/{sf}"
    man = json.load(open(os.path.join(d, "_scale_manifest.json")))
    bad = []
    for name, want in man["content_md5"].items():
        h = hashlib.md5()
        with open(os.path.join(d, name), "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 24), b""):
                h.update(chunk)
        if h.hexdigest() != want:
            bad.append(name)
    print(sf, "OK" if not bad else f"MISMATCH {bad}")
PY

python tools/ab_r11.py spread /root/testdata/sf0.1 \
  > .r11/ab_spread64k_sf01.txt 2>/dev/null
AB_SPREAD_B=32768 python tools/ab_r11.py spread /root/testdata/sf0.1 \
  dedup_minhash_lsh quality_bigram_lm token_heavy_hitters \
  dedup_substring_spans vocab_bpe_segment hybrid_search_rrf \
  > .r11/ab_spread32k_sf01.txt 2>/dev/null
python tools/ab_r11.py lshpairs /root/testdata/sf0.1 \
  > .r11/ab_lshpairs_sf01.txt 2>/dev/null
python tools/ab_r11.py lshpairs .testdata/sf10 \
  > .r11/ab_lshpairs_sf10.txt 2>/dev/null
python tools/ab_r11.py annwide /root/testdata/sf0.1 32 \
  > .r11/ab_annwide_sf01.txt 2>/dev/null
# regime cutover binds between 20k (cost-model crossover) and 100k (the
# r9 threshold): sf3's 60k-row corpus is inside the disputed band
python tools/ab_r11.py cutover .testdata/sf3 ann_knn_join \
  > .r11/ab_cutover_sf3.txt 2>/dev/null
python tools/ab_r11.py spread .testdata/sf10 \
  dedup_minhash_lsh quality_bigram_lm dedup_substring_spans \
  vocab_bpe_segment > .r11/ab_spread64k_sf10.txt 2>/dev/null

echo CHAIN_DONE
