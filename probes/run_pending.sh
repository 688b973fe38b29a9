#!/bin/bash
# Pending TPU measurements (run sequentially — ONE jax process at a time).
# Usage: bash probes/run_pending.sh [outdir]
# Generous timeouts: killing a process mid-TPU-execution can wedge the
# tunneled device for hours.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/pending_measurements}
mkdir -p "$OUT"

echo "== health check =="
timeout 300 python -c "
import jax, jax.numpy as jnp
print('TPU ok:', float(jax.jit(lambda a:(a@a).sum())(jnp.ones((256,256)))))
" || { echo 'TPU not reachable; aborting'; exit 1; }

run() {
  name=$1; shift
  echo "== $name =="
  timeout 1800 "$@" 2>&1 | tee "$OUT/$name.log" | tail -12
}

run train_decomp  python probes/train_decomp.py
run train_step    python probes/train_step.py
run train_step_bf16 python probes/train_step.py bf16
run bench         python bench.py
run benchmarks    python benchmarks.py
run compose_gap   python probes/compose_gap.py
run rs_overhead   python probes/rs_overhead.py
echo "done; logs in $OUT"
