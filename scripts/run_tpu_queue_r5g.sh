#!/bin/bash
# Round-5 serial TPU queue, pass G: in-model A/Bs for the r5 gated levers.
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
# head with the seam convs ON (default) vs OFF
run head_seam1       7200 python scripts/probe_head.py bfloat16 352 1
run head_seam0       7200 env FREQFUSION_HEAD_SEAM=0 python scripts/probe_head.py bfloat16 352 1
# NAF: separate the strip-budget win from the intro/ending SeamConv swap
run naf_seam0        5400 env FREQFUSION_SEAM_KERNEL=0 python scripts/probe_whole.py nafnet --dtype=bfloat16
# HAT: in-model x-roll folding A/B (post conv revert baseline first)
run hat_inshift0     5400 python scripts/probe_whole.py hat --dtype=bfloat16
run hat_inshift1     5400 env FREQFUSION_HAB_INSHIFT=1 python scripts/probe_whole.py hat --dtype=bfloat16
run train_cached_g   3600 python scripts/bench_train.py
echo "=== queue G done $(date +%H:%M:%S) ===" | tee -a .tpu_logs/queue.log
