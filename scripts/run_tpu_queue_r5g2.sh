#!/bin/bash
# Round-5 serial TPU queue, pass G2 (lean): single-program A/Bs only.
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
run hat_inshift1     7200 env FREQFUSION_HAB_INSHIFT=1 python scripts/probe_whole.py hat --dtype=bfloat16
run naf_seam0        5400 env FREQFUSION_SEAM_KERNEL=0 python scripts/probe_whole.py nafnet --dtype=bfloat16
run full_g2          7200 python scripts/probe_whole.py full --dtype=bfloat16
run train_cached_g   3600 python scripts/bench_train.py
echo "=== queue G2 done $(date +%H:%M:%S) ===" | tee -a .tpu_logs/queue.log
