#!/bin/bash
# Round-5 serial TPU queue, pass C: train-step pathology attribution +
# cab repack A/B + head decomposition refresh. ONE process at a time.
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

run probe_cabrepack  5400 python scripts/probe_cabrepack.py bfloat16
run probe_headbwd   10800 python scripts/probe_headbwd.py
run probe_head_bf16  7200 python scripts/probe_head.py bfloat16 352 1
echo "=== queue C done $(date +%H:%M:%S) ===" | tee -a .tpu_logs/queue.log
