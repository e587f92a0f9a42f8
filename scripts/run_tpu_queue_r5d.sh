#!/bin/bash
# Round-5 serial TPU queue, pass D: NAF glue attribution + SGFN strip sweep.
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

run probe_nafglue    7200 python scripts/probe_nafglue.py bfloat16
run sgfn_b32         5400 env FREQFUSION_STRIP_BUDGET_MB=32 python scripts/probe_datparts.py bfloat16 sgfn
run sgfn_b48         5400 env FREQFUSION_STRIP_BUDGET_MB=48 python scripts/probe_datparts.py bfloat16 sgfn
echo "=== queue D done $(date +%H:%M:%S) ===" | tee -a .tpu_logs/queue.log
