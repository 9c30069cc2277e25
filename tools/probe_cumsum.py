"""Slope-probe: XLA jnp.cumsum vs Pallas block-scan on long i32 arrays.

XLA lowers long cumsums to O(log n) shifted-add passes over HBM; the
sequential-grid Pallas scan (ops/pallas_scan.cumsum_i32 — the device-
scale prefixSum64 counterpart) does one read + one write.  Measures
both at s14-like and s16-like sizes.  (The flat-CSR assembly used to
run two nnz(C)-scale cumsums; it is window-granular now and runs
none — this probe motivated that redesign.)

Usage: python tools/probe_cumsum.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sparse_matrix_with_flops_tpu.utils.timing import slope_bench


def main():
    print("backend:", jax.default_backend(), flush=True)
    for n in (1 << 23, 1 << 25):
        x = jnp.ones((n,), jnp.int32)

        def xla_step(p):
            return jnp.cumsum(x + p.astype(jnp.int32))[-1]

        ms = slope_bench(xla_step)
        gbs = n * 4 * 2 / ms / 1e6
        print(f"xla cumsum    n={n>>20}M: {ms:8.3f} ms ({gbs:6.1f} GB/s)",
              flush=True)

        try:
            from sparse_matrix_with_flops_tpu.ops.pallas_scan import (
                cumsum_i32,
            )

            def pl_step(p):
                return cumsum_i32(x + p.astype(jnp.int32))[-1]

            ms = slope_bench(pl_step)
            gbs = n * 4 * 2 / ms / 1e6
            print(
                f"pallas cumsum n={n>>20}M: {ms:8.3f} ms ({gbs:6.1f} GB/s)",
                flush=True,
            )
        except Exception as e:
            print("pallas cumsum FAIL:", str(e).splitlines()[0][:140],
                  flush=True)


if __name__ == "__main__":
    main()
