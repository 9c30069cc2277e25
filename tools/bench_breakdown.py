"""Assembly breakdown + scale sweep for the ELL-ESC pipeline.

Usage: python tools/bench_breakdown.py [scales...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import sparse_matrix_with_flops_tpu.ops.ell_esc as E
from sparse_matrix_with_flops_tpu.ops.spgemm import spgemm_upper_bounds
from sparse_matrix_with_flops_tpu.utils.generate import rmat_csr
from sparse_matrix_with_flops_tpu.utils.timing import bench_fn


def main():
    scales = [int(x) for x in sys.argv[1:]] or [14, 15, 16]
    print("backend:", jax.default_backend(), flush=True)
    for scale in scales:
        a = rmat_csr(scale, edge_factor=8, seed=7, weights="random")
        cap, _ = spgemm_upper_bounds(a, a)
        plan = E.plan_ell(a, a)
        da = jax.device_put(a)
        use_pallas = jax.default_backend() == "tpu"
        t0 = time.monotonic()
        ms_t = bench_fn(
            lambda x: E._tiles_impl(x, x, plan, E.CHUNK, use_pallas),
            da, warmup=1, iters=3,
        )
        c_t = time.monotonic() - t0

        fc, fv, counts, flat_base = E._tiles_impl(da, da, plan, E.CHUNK, use_pallas)
        jax.block_until_ready(fc)
        nnzc = int(jnp.sum(counts))
        out_cap = 1024
        while out_cap < nnzc:
            out_cap = int(out_cap * 1.25 + 1023) & ~1023
        t0 = time.monotonic()
        ms_a = bench_fn(
            lambda pc, pv, c, f: E._assemble_jit(pc, pv, c, f, plan.ncols, out_cap),
            fc,
            fv,
            counts,
            flat_base,
            warmup=1,
            iters=3,
        )
        c_a = time.monotonic() - t0
        t0 = time.monotonic()
        ms_full = bench_fn(lambda x: E.spgemm_ell(x, x, plan), da, warmup=1, iters=3)
        c_f = time.monotonic() - t0
        sync_ms = ms_full - ms_t - ms_a
        print(
            f"scale {scale}: flops={cap} nnzC={nnzc} | tiles {ms_t:.1f}ms "
            f"assembly {ms_a:.1f}ms full {ms_full:.1f}ms (sync/dispatch "
            f"{sync_ms:.1f}ms) GF={2.0*cap/ms_full/1e6:.3f} "
            f"[compiles {c_t:.0f}/{c_a:.0f}/{c_f:.0f}s]",
            flush=True,
        )
        # scipy best-of-3
        try:
            import scipy.sparse as sp

            rp = np.asarray(a.row_ptr)
            nnz = int(rp[-1])
            sa = sp.csr_matrix(
                (np.asarray(a.values)[:nnz], np.asarray(a.col_ind)[:nnz], rp),
                shape=a.shape,
            )
            best = min(
                [
                    (lambda t0: ((sa @ sa), time.monotonic() - t0)[1])(
                        time.monotonic()
                    )
                    for _ in range(3)
                ]
            )
            print(
                f"  scipy best {best*1e3:.0f}ms -> speedup {best*1e3/ms_full:.2f}x",
                flush=True,
            )
        except Exception as e:
            print("  scipy failed", e, flush=True)


if __name__ == "__main__":
    main()
