#!/bin/bash
# Round-3 serial TPU measurement batch — run ONE at a time (single-tenant
# tunnel).  Usage: bash tools/r3_tpu_batch.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r3batch}
mkdir -p "$OUT"

run() { # name cmd...
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 3000 "$@" > "$OUT/$name.log" 2>&1
  echo "    exit=$? tail: $(tail -1 "$OUT/$name.log")"
}

# 1. hub routing sweep: move wide rows between tile bins and the dense hub
run f_mw8192  python tools/profile_fused.py 14 8 64 8192  "tiles s4,tiles s5,tiles full,asm full,fused"
run f_mw16384 python tools/profile_fused.py 14 8 64 16384 "tiles full,fused"
run f_mw4096  python tools/profile_fused.py 14 8 64 4096  "tiles full,fused"
# 2. bf16 hub matmul
SMF_HUB_BF16=1 run f_bf16 python tools/profile_fused.py 14 8 64 8192 fused
# 3. chunk=32 (denser packing after the {2^k,3*2^k} snapping)
run f_c32 python tools/profile_fused.py 14 8 32 8192 fused
echo "ALL DONE ($(date +%H:%M:%S))"
