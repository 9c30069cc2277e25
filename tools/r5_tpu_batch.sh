#!/bin/bash
# Round-5 TPU artifact batch into benchmarks/results_r5.jsonl.
# Sequential (single-tenant chip); run from the repo root with NOTHING
# else on the chip — concurrent host processes contaminated two earlier
# s16 captures (the CPU baseline swung 281 -> 426 ms).
set -x
OUT=benchmarks/results_r5.jsonl
export JAX_COMPILATION_CACHE_DIR="$(pwd)/.jax_cache"

# 1. reference-anchor families, production route + both engines (duel)
timeout 3500 python -u -m sparse_matrix_with_flops_tpu.cli.corpus \
  --families --duel --check --mt --out "$OUT"

# 2. power-law anchors: s16 at the tuned wide-class routing (clean rerun)
timeout 3500 python -u -m sparse_matrix_with_flops_tpu.cli.corpus \
  --synthetic --scales 16 --kernel ell --max-w 32768 --check --mt --out "$OUT"

# 3. R-MCL reference-scale headline (planted partition, s16 scale)
timeout 3500 python -u tools/bench_rmcl_scale.py 1024 64 128 --out "$OUT"

# 4. the parts=2 ELL cliff recheck (VERDICT r4 #7)
timeout 3500 python -u -m sparse_matrix_with_flops_tpu.cli.corpus \
  --cant --scales "" --kernel ell --parts 2 --out "$OUT"
timeout 3500 python -u -m sparse_matrix_with_flops_tpu.cli.corpus \
  --cant --scales "" --kernel ell --parts 4 --out "$OUT"

# 5. on-chip smoke (incl. wide compacts + tiled fused ring body)
timeout 3500 python -u tools/tpu_smoke.py 2>&1 | tee docs/TPU_SMOKE.log
