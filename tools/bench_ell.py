"""End-to-end ELL-ESC benchmark on the attached device + honest sort probe.

Usage: python tools/bench_ell.py [scale] [edge_factor]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sparse_matrix_with_flops_tpu.ops.ell_esc import plan_ell, spgemm_ell, _tiles_impl
from sparse_matrix_with_flops_tpu.ops.spgemm import spgemm_upper_bounds
from sparse_matrix_with_flops_tpu.utils.generate import rmat_csr
from sparse_matrix_with_flops_tpu.utils.timing import bench_fn


def honest_sort_probe():
    rng = np.random.default_rng(0)
    for rows, w in [(16384, 1024), (16384, 2048), (32768, 512)]:
        k = jnp.asarray(rng.integers(0, 1 << 30, size=(rows, w)).astype(np.int32))
        v = jnp.asarray(rng.random((rows, w)).astype(np.float32))

        def f(k, v):
            for _ in range(4):
                k, v = jax.lax.sort((k, v), dimension=1, num_keys=1)
                k = k ^ (k >> 5)  # chain dependency, defeat folding
            return k, v

        ms = bench_fn(jax.jit(f), k, v, warmup=1, iters=3) / 4
        print(
            f"chained sort ({rows},{w}): {ms:8.2f} ms/sort "
            f"({rows*w/1e6/ms*1000:7.1f} M elem/s)",
            flush=True,
        )


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    ef = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print("backend:", jax.default_backend(), flush=True)
    if os.environ.get("SORT_PROBE"):
        honest_sort_probe()

    a = rmat_csr(scale, edge_factor=ef, seed=7, weights="random")
    cap, _ = spgemm_upper_bounds(a, a)
    t0 = time.monotonic()
    import sparse_matrix_with_flops_tpu.ops.ell_esc as E
    max_w = int(os.environ.get("MAX_W", "8192"))
    plan = plan_ell(a, a, max_w=max_w)
    print(
        f"plan {time.monotonic()-t0:.1f}s  bins={[(w, len(r)) for w, r, *_ in plan.bins]} "
        f"huge={plan.huge_rows.size} chunks={plan.total_chunks} out_cap={plan.out_cap}",
        flush=True,
    )
    da = jax.device_put(a)
    t0 = time.monotonic()
    ms_t = bench_fn(lambda x: _tiles_impl(x, x, plan, 128), da, warmup=1, iters=3)
    print(
        f"tiles-only scale {scale}: {ms_t:.2f} ms (compile {time.monotonic()-t0:.0f}s) "
        f"GFLOPS={2.0*cap/ms_t/1e6:.3f}",
        flush=True,
    )
    t0 = time.monotonic()
    ms = bench_fn(lambda x: spgemm_ell(x, x, plan), da, warmup=1, iters=3)
    print(
        f"ell-esc (exact) scale {scale}: {ms:.2f} ms (compile {time.monotonic()-t0:.0f}s) "
        f"GFLOPS={2.0*cap/ms/1e6:.3f}",
        flush=True,
    )

    # scipy CPU reference on the same matrix
    try:
        import scipy.sparse as sp

        rp = np.asarray(a.row_ptr)
        nnz = int(rp[-1])
        sa = sp.csr_matrix(
            (np.asarray(a.values)[:nnz], np.asarray(a.col_ind)[:nnz], rp),
            shape=a.shape,
        )
        t0 = time.monotonic()
        _ = sa @ sa
        cpu_ms = (time.monotonic() - t0) * 1e3
        print(
            f"scipy cpu: {cpu_ms:.1f} ms  GFLOPS={2.0*cap/cpu_ms/1e6:.3f} "
            f"-> speedup {cpu_ms/ms:.2f}x",
            flush=True,
        )
    except Exception as e:
        print("scipy failed:", e, flush=True)


if __name__ == "__main__":
    main()
