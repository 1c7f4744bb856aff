#!/bin/bash
# Full TPU measurement battery: every bench config + accuracy/force probes.
# Writes one log per item under $OUT (default /tmp/battery).  Run from the
# repo root on a host with the axon TPU tunnel up.  Each item is independent;
# rerun a single one by copying its line.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/battery}
mkdir -p "$OUT"

run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  { time timeout 3000 "$@"; } >"$OUT/$name.log" 2>&1
  echo "--- rc=$? ($name)"
  tail -3 "$OUT/$name.log"
}

run headline     python bench.py
run xlbomd_ml    python bench.py --config xlbomd-ml
run ml_trained   python bench.py --config xlbomd-ml-trained
run scf          python bench.py --config scf
run scf_eigh     python bench.py --config scf-eigh
run scf_row3     python bench.py --config scf-row3
run bomd         python bench.py --config bomd
run opt          python bench.py --config opt
run opt_conv     python bench.py --config opt-conv
run opt_sd       python bench.py --config opt-sd
run nanostar     python bench.py --config nanostar --timing
run acc_golden   python tools/accuracy_probe.py --stage golden
run acc_sp2      python tools/accuracy_probe.py --stage golden --sp2
# the f64 reference stage must run on CPU (axon TPU has no x64)
run acc_ref64    env JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu \
                 python tools/accuracy_probe.py --stage ref64
run acc_batch    python tools/accuracy_probe.py --stage batch
run drift        python tools/force_quality_probe.py --stage drift
run kernel_smoke python tools/tpu_kernel_smoke.py
echo "=== battery done ==="
