"""Slope-timed SpGEMM pipeline benchmark (the honest numbers).

The axon tunnel makes single-shot wall timings lies in both directions:
block_until_ready can return before completion, and any host fetch pays a
~28ms RTT.  This harness times k repetitions of the op INSIDE one jitted
lax.scan — with a runtime-zero perturbation of A's values per iteration
(defeats CSE/hoisting) and a full-output checksum in the carry (defeats
DCE) — and reports (T(k2) - T(k1)) / (k2 - k1): pure steady-state kernel
time, RTT and dispatch cancelled.

Usage: python tools/bench_slope.py [scale] [edge_factor]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(build_fn, ks=(1, 5), iters=3):
    times = {}
    for k in ks:
        f = build_fn(k)
        float(f())  # compile + warm
        ts = []
        for _ in range(iters):
            t0 = time.monotonic()
            float(f())
            ts.append((time.monotonic() - t0) * 1e3)
        ts.sort()
        times[k] = ts[len(ts) // 2]
    k1, k2 = ks
    return (times[k2] - times[k1]) / (k2 - k1), times


def main():
    from sparse_matrix_with_flops_tpu.formats.csr import CSR
    from sparse_matrix_with_flops_tpu.ops.ell_esc import (
        _assemble_jit,
        _flat_layout,
        _tiles_impl,
        _use_pallas_default,
        plan_ell,
        spgemm_ell,
    )
    from sparse_matrix_with_flops_tpu.ops.spgemm import spgemm_upper_bounds
    from sparse_matrix_with_flops_tpu.utils.generate import rmat_csr

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    ef = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print(f"backend: {jax.default_backend()}  scale={scale} ef={ef}", flush=True)

    a = rmat_csr(scale, edge_factor=ef, seed=7, weights="random")
    oflops, _ = spgemm_upper_bounds(a, a)
    flops2 = 2.0 * oflops
    plan = plan_ell(a, a)
    up = _use_pallas_default()
    dev_a = jax.device_put(a)

    # warm the exact path twice -> nnzc bucket cached + validated
    c1 = spgemm_ell(dev_a, dev_a, plan)
    c2 = spgemm_ell(dev_a, dev_a, plan)
    cap = getattr(plan, "_nnzc_cache", None)
    nnzc = int(np.asarray(c2.row_ptr)[-1])
    print(f"flops={int(oflops)} nnzc={nnzc} out_cap={cap}", flush=True)

    def build_fused(k):
        @jax.jit
        def f():
            def body(acc, x):
                a2 = CSR(dev_a.row_ptr, dev_a.col_ind, dev_a.values + x, dev_a.ncols)
                csr, nz = _tiles_impl(
                    a2, dev_a, plan, plan.chunk, up, fused_out_cap=cap
                )
                acc = (
                    acc
                    + jnp.sum(csr.values)
                    + jnp.sum(csr.row_ptr).astype(jnp.float32)
                    + jnp.sum(csr.col_ind).astype(jnp.float32)
                    + nz.astype(jnp.float32)
                )
                return acc, None

            acc, _ = jax.lax.scan(body, 0.0, jnp.zeros(k))
            return acc

        return f

    def build_tiles(k):
        @jax.jit
        def f():
            def body(acc, x):
                a2 = CSR(dev_a.row_ptr, dev_a.col_ind, dev_a.values + x, dev_a.ncols)
                fc, fv, counts, fb = _tiles_impl(a2, dev_a, plan, plan.chunk, up)
                acc = (
                    acc
                    + jnp.sum(fv)
                    + jnp.sum(fc).astype(jnp.float32)
                    + jnp.sum(counts).astype(jnp.float32)
                )
                return acc, None

            acc, _ = jax.lax.scan(body, 0.0, jnp.zeros(k))
            return acc

        return f

    def build_assemble(k):
        fc, fv, counts, fb = _tiles_impl(dev_a, dev_a, plan, plan.chunk, up)
        fc, fv, counts, fb = jax.block_until_ready((fc, fv, counts, fb))

        @jax.jit
        def f():
            def body(acc, x):
                csr = _assemble_jit(
                    fc, fv + x, counts, fb, plan.ncols, cap, up
                )
                acc = (
                    acc
                    + jnp.sum(csr.values)
                    + jnp.sum(csr.col_ind).astype(jnp.float32)
                )
                return acc, None

            acc, _ = jax.lax.scan(body, 0.0, jnp.zeros(k))
            return acc

        return f

    for name, b in (
        ("fused (tiles+assembly)", build_fused),
        ("tiles only", build_tiles),
        ("assembly only", build_assemble),
    ):
        try:
            ms, raw = slope_time(b)
            print(
                f"{name:24s} {ms:9.2f} ms/op  {flops2 / ms / 1e6:8.2f} GFLOPS"
                f"   raw={ {k: round(v, 1) for k, v in raw.items()} }",
                flush=True,
            )
        except Exception as e:
            print(f"{name} FAIL: {str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
