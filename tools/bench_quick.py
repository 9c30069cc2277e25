import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import sparse_matrix_with_flops_tpu.ops.ell_esc as E
from sparse_matrix_with_flops_tpu.ops.spgemm import spgemm_upper_bounds
from sparse_matrix_with_flops_tpu.utils.generate import rmat_csr
from sparse_matrix_with_flops_tpu.utils.timing import bench_fn

print("backend:", jax.default_backend(), flush=True)
for scale, mode in [(14, "full"), (15, "full"), (16, "full"), (16, "tiled")]:
    a = rmat_csr(scale, edge_factor=8, seed=7, weights="random")
    cap, _ = spgemm_upper_bounds(a, a)
    plan = E.plan_ell(a, a)
    da = jax.device_put(a)
    up = jax.default_backend() == "tpu"
    t0 = time.monotonic()
    try:
        if mode == "tiled":
            fn = lambda x: E._tiles_impl(x, x, plan, E.CHUNK, up)
        else:
            fn = lambda x: E.spgemm_ell(x, x, plan)
        ms = bench_fn(fn, da, warmup=1, iters=3)
        print(f"scale {scale} {mode}: {ms:.1f} ms (compile {time.monotonic()-t0:.0f}s) GF={2.0*cap/ms/1e6:.3f}", flush=True)
    except Exception as e:
        print(f"scale {scale} {mode}: FAIL {str(e).splitlines()[0][:100]}", flush=True)
