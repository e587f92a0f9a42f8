#!/bin/bash
# Round-5 serial TPU queue, pass H: final headline bench + cold/warm
# cold-start measurement (VERDICT #3).
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
run parity_inshift   5400 python scripts/parity_inshift.py bfloat16
# COLD: a separate empty cache dir isolates the cold-start number
run bench_cold      10800 env FREQFUSION_JAX_CACHE=/tmp/ff_cold_cache python bench.py
# WARM: fresh process, same cache dir now populated by the cold run
run bench_warm       7200 env FREQFUSION_JAX_CACHE=/tmp/ff_cold_cache python bench.py
# also populate the default .jax_cache for the driver's bench
run prewarm          7200 python scripts/prewarm.py
echo "=== queue H done $(date +%H:%M:%S) ===" | tee -a .tpu_logs/queue.log
