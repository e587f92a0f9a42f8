#!/bin/bash
# Round-5 serial TPU measurement queue, pass B (train bench + probe
# refresh). ONE process at a time (a second TPU process blocks on the
# tunnel — CLAUDE.md). Logs land in .tpu_logs/. Run from the repo root.
set -u
cd "$(dirname "$0")/.."
mkdir -p .tpu_logs
run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a .tpu_logs/queue.log
  timeout "$tmo" "$@" > ".tpu_logs/$name.log" 2> ".tpu_logs/$name.err"
  local rc=$?
  echo "=== $name rc=$rc $(date +%H:%M:%S) ===" | tee -a .tpu_logs/queue.log
}

run probe_train      5400 python scripts/probe_train.py
run train_cached     3600 python scripts/bench_train.py
run train_live      10800 env FREQFUSION_TRAIN_MODE=live python scripts/bench_train.py
run probe_whole_bf16 7200 python scripts/probe_whole.py hat dat nafnet full --dtype=bfloat16
run probe_datparts   7200 python scripts/probe_datparts.py bfloat16
run probe_nafparts   7200 python scripts/probe_nafparts.py bfloat16
echo "=== queue done $(date +%H:%M:%S) ===" | tee -a .tpu_logs/queue.log
