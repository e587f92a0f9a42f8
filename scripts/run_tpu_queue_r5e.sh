#!/bin/bash
# Round-5 serial TPU queue, pass E.
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
run probe_cabrepack2 10800 python scripts/probe_cabrepack.py bfloat16
run stepfull          7200 python scripts/probe_headbwd.py step_full step_ssim step_fft
run probe_nafglue     7200 python scripts/probe_nafglue.py bfloat16
run sgfn_b32          5400 env FREQFUSION_STRIP_BUDGET_MB=32 python scripts/probe_datparts.py bfloat16 sgfn
echo "=== queue E done $(date +%H:%M:%S) ===" | tee -a .tpu_logs/queue.log
