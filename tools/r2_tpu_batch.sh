#!/bin/bash
# Round-2 serial TPU measurement batch — run ONE at a time (single-tenant
# tunnel).  Usage: bash tools/r2_tpu_batch.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r2batch}
mkdir -p "$OUT"

run() { # name cmd...
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 3000 "$@" > "$OUT/$name.log" 2>&1
  echo "    exit=$? tail: $(tail -1 "$OUT/$name.log")"
}

# 1. full per-stage profile at the tuned chunk (the headline anatomy)
run prof_c64 python tools/profile_fused.py 14 8
# 2. chunk variants (fused total only — cheap)
run prof_c32 python tools/profile_fused.py 14 8 32 8192 fused
run prof_c16 python tools/profile_fused.py 14 8 16 8192 fused
# 3. max_w variants: push wide bins into the dense-MXU hub
run prof_w2048 python tools/profile_fused.py 14 8 64 2048 "tiles s3,tiles s4,tiles full,fused"
run prof_w4096 python tools/profile_fused.py 14 8 64 4096 fused
# 4. bf16 hub (opt-in knob)
SMF_HUB_BF16=1 run prof_bf16 python tools/profile_fused.py 14 8 64 8192 fused
# 5. (retired) pallas_esc was benchmarked on the real chip, found
#    Mosaic-broken, and deleted — decision record: docs/ROUND2_NOTES.md §4b
# 6. corpus rows: s14/s16 + cant-class with exact scipy nnz(C) cross-check
run corpus python -m sparse_matrix_with_flops_tpu.cli.corpus \
  --synthetic --scales 14,16 --cant --check --out benchmarks/results_r2.jsonl
# 7. headline bench
run bench python bench.py
echo "ALL DONE ($(date +%H:%M:%S))"
