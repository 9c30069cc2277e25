"""Probe: hub-row compaction cost (compact_nonzero_rows) at s14 shapes.

profile_fused (r3) attributes 12.4 ms to '+hub compact' — ~10x the
VPU-pass model (~28 roll passes over (R, 16384)).  Isolate the kernel,
sweep rows_per_step, and split the scan half (_shift_nonkeep) from the
pull half to find where the time goes.

Usage: python tools/probe_compact.py [H] [NCP]
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sparse_matrix_with_flops_tpu.ops.pallas_sort import (
        _compact_left_packed,
        _shift_nonkeep,
        compact_nonzero_rows,
    )
    from sparse_matrix_with_flops_tpu.utils.timing import slope_bench

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 576
    ncp = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    ncols = ncp
    rng = np.random.default_rng(0)
    dense = np.zeros((h, ncp), np.float32)
    for i in range(h):
        cols = rng.choice(ncols, size=4000, replace=False)
        dense[i, cols] = rng.random(4000).astype(np.float32) + 0.1
    dv = jnp.asarray(dense)
    print(f"backend={jax.default_backend()} H={h} ncp={ncp}", flush=True)

    for rps in (8, 16, 32):
        ms = slope_bench(
            lambda x, rps=rps: compact_nonzero_rows(
                dv + x, ncols, rows_per_step=rps
            )
        )
        print(f"compact_nonzero_rows rps={rps}: {ms:8.2f} ms", flush=True)

    # scan-only and pull-only kernels at rps=8 to split the cost
    def scan_kernel(v_ref, o_ref, *, N):
        val = v_ref[:]
        keep = val != 0
        o_ref[:] = _shift_nonkeep(keep, N)

    def scan_only(v):
        r, n = v.shape
        return pl.pallas_call(
            partial(scan_kernel, N=n),
            grid=(r // 8,),
            in_specs=[pl.BlockSpec((8, n), lambda g: (g, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, n), lambda g: (g, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((r, n), jnp.int32),
        )(v)

    ms = slope_bench(lambda x: scan_only(dv + x))
    print(f"scan half (_shift_nonkeep) only: {ms:8.2f} ms", flush=True)

    def pull_kernel(v_ref, o_ref, *, N):
        val = v_ref[:]
        r = val.shape[0]
        keep = val != 0
        x = jnp.concatenate(
            [jax.lax.broadcasted_iota(jnp.int32, val.shape, 1),
             pltpu.bitcast(val, jnp.int32)], axis=0)
        x = _compact_left_packed(x, keep, N)
        o_ref[:] = x[r:]

    def pull_too(v):
        r, n = v.shape
        return pl.pallas_call(
            partial(pull_kernel, N=n),
            grid=(r // 8,),
            in_specs=[pl.BlockSpec((8, n), lambda g: (g, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, n), lambda g: (g, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((r, n), jnp.int32),
        )(v)

    ms = slope_bench(lambda x: pull_too(dv + x))
    print(f"scan + pull (no final mask/select): {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
