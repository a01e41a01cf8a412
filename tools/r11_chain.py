#!/usr/bin/env python
"""r11_chain.py — one-session orchestration of the round-11 re-record
(the r10 verdict's item 1, owed since r9): benches every regenerated,
md5-verified fixture on the CURRENT HEAD back-to-back, records the extended streaming matrix
(2 stateful probes x 2 scales x 4 batches — r9 verdict item 6), then
generates + benches sf100 (disk-aware: sf1/sf3/sf30 are deleted first)
and captures the sf100 bigram audit. Each step appends to .r11/chain.log
and writes its JSON next to the repo root BENCH artifacts.

    python tools/r11_chain.py [--skip-sf100]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
TD = ".testdata"
os.makedirs(".r11", exist_ok=True)
LOG = open(".r11/chain.log", "a", buffering=1)


def log(msg: str) -> None:
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def run(cmd: list[str], env: dict | None = None, out: str | None = None) -> None:
    e = dict(os.environ)
    if env:
        e.update(env)
    with open(".r11/chain.err", "a") as errfh:
        res = subprocess.run(cmd, env=e, stdout=subprocess.PIPE, stderr=errfh,
                             text=True)
    if res.returncode != 0:
        log(f"FAILED ({res.returncode}): {' '.join(cmd)}")
        sys.exit(res.returncode)
    if out:
        last = res.stdout.strip().splitlines()[-1]
        with open(out, "w") as fh:
            fh.write(last + "\n")


def bench(sf_dir: str, out: str, mem: str) -> None:
    log(f"bench {sf_dir} -> {out} (mem={mem})")
    run([sys.executable, "bench.py"],
        env={"SPARK_GRAFT_SF_DIR": os.path.abspath(sf_dir),
             "SPARK_GRAFT_DRIVER_MEM": mem},
        out=out)
    d = json.load(open(out))
    p = d["provenance"]
    log(f"  {out}: total={d['value']}s n={d['n_queries']} "
        f"errors={d['errors']} sha={p['engine_git_sha']} "
        f"canary={p['drift_canary']['sec']} "
        f"canary_shuffle={p['drift_canary_shuffle']['sec']}")


def stream_probe(sf_dir: str, probe: str, mem: str, out: str) -> None:
    log(f"stream probe {probe} {sf_dir} (4 batches)")
    run([sys.executable, "tools/stream_scale_probe.py", sf_dir,
         "--probe", probe, "--batches", "4"],
        env={"SPARK_GRAFT_DRIVER_MEM": mem}, out=out)


def main() -> None:
    skip_sf100 = "--skip-sf100" in sys.argv

    bench("/root/testdata/sf0.1", "BENCH_sf0.1.json", "8g")
    bench(f"{TD}/sf1", "BENCH_sf1.json", "16g")
    bench(f"{TD}/sf3", "BENCH_sf3.json", "16g")
    bench(f"{TD}/sf10", "BENCH_sf10.json", "24g")
    bench(f"{TD}/sf30", "BENCH_sf30.json", "48g")

    for p in ("simhash_bands", "user_profiles"):
        stream_probe(f"{TD}/sf30", p, "48g", f".r11/stream_{p}_sf30.json")

    bench(f"{TD}/sf60", "BENCH_sf60.json", "48g")
    for p in ("simhash_bands", "user_profiles"):
        stream_probe(f"{TD}/sf60", p, "48g", f".r11/stream_{p}_sf60.json")

    points = {}
    for p in ("simhash_bands", "user_profiles"):
        for sf in ("sf30", "sf60"):
            points[f"{p}/{sf}"] = json.load(
                open(f".r11/stream_{p}_{sf}.json"))
    sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True).stdout.strip()
    json.dump({"metric": "stateful_stream_drain_matrix", "unit": "sec",
               "points": points,
               "provenance": {"engine_git_sha": sha,
                              "tool": "tools/stream_scale_probe.py",
                              "batches_per_drain": 4,
                              "provider": "RocksDBStateStoreProvider"}},
              open("BENCH_stream.json", "w"), indent=1)
    log("BENCH_stream.json written (2 probes x 2 scales x 4 batches)")

    if skip_sf100:
        log("CHAIN DONE (sf100 skipped)")
        return

    for d in (f"{TD}/sf1", f"{TD}/sf3", f"{TD}/sf30"):
        shutil.rmtree(d, ignore_errors=True)  # sf100 disk+cache headroom
    log("gen sf100 (sf10 x 10)")
    run([sys.executable, "tools/make_scale_data.py", f"{TD}/sf10",
         f"{TD}/sf100", "10"])
    shutil.rmtree(f"{TD}/sf60", ignore_errors=True)
    bench(f"{TD}/sf100", "BENCH_sf100.json", "64g")

    log("audit sf100 (quality_bigram_lm + canary)")
    with open(".r11/audit_sf100_bigram.txt", "w") as fh:
        res = subprocess.run(
            [sys.executable, "tools/shuffle_audit.py", f"{TD}/sf100",
             "quality_bigram_lm", "agg_by_agegroup"],
            env={**os.environ, "SPARK_GRAFT_DRIVER_MEM": "64g"},
            stdout=fh, stderr=subprocess.STDOUT)
    log(f"audit exit={res.returncode}")
    log("CHAIN DONE")


if __name__ == "__main__":
    main()
