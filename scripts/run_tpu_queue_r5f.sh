#!/bin/bash
# Round-5 serial TPU queue, pass F: re-measure after the r5 changes
# (SeamConv first/last convs, matmul blurs, NAF strip budgets).
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
run probe_whole_f    10800 python scripts/probe_whole.py nafnet hat dat full --dtype=bfloat16
run probe_head_f      7200 python scripts/probe_head.py bfloat16 352 1
run train_cached_f    3600 python scripts/bench_train.py
echo "=== queue F done $(date +%H:%M:%S) ===" | tee -a .tpu_logs/queue.log
