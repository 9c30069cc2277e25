"""Probe: R-MCL hub path anatomy (18.3 ms of the 39.7 ms step at s14).

Splits: union-row gather, densify scatter (add vs unique-set), matmul,
dense prune/select.  Usage: python tools/probe_rmcl_hub.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sparse_matrix_with_flops_tpu.config import INDEX_DTYPE, QVALUE_DTYPE
    from sparse_matrix_with_flops_tpu.models.rmcl_ell import (
        _prune_select_lanes,
    )
    from sparse_matrix_with_flops_tpu.utils.timing import slope_bench

    n, S, H, kh = 16384, 128, 464, 7936
    rng = np.random.default_rng(0)
    cols = jnp.asarray(
        np.sort(rng.integers(0, n, size=(kh, S)), axis=1).astype(np.int32)
    )
    vals = jnp.asarray(rng.random((kh, S)).astype(np.float32))
    a_d = jnp.asarray((rng.random((H, kh)) < 0.1).astype(np.float32))
    rix = jax.lax.broadcasted_iota(INDEX_DTYPE, (kh, S), 0)
    print(f"backend={jax.default_backend()} n={n} S={S} H={H} kh={kh}", flush=True)

    def dens_add(x):
        md = jnp.zeros((kh, n), QVALUE_DTYPE)
        return md.at[rix, cols].add(vals + x, mode="drop")

    ms = slope_bench(dens_add)
    print(f"densify scatter-ADD:       {ms:8.2f} ms", flush=True)

    def dens_set(x):
        md = jnp.zeros((kh, n), QVALUE_DTYPE)
        return md.at[rix, cols].set(
            vals + x, mode="drop", unique_indices=True
        )

    ms = slope_bench(dens_set)
    print(f"densify scatter-SET uniq:  {ms:8.2f} ms", flush=True)

    def dens_mm(x):
        md = dens_set(x)
        return jnp.dot(a_d, md, preferred_element_type=jnp.float32)

    ms = slope_bench(dens_mm)
    print(f"+ matmul:                  {ms:8.2f} ms", flush=True)

    def full(x):
        c_h = dens_mm(x)
        lanes = jax.lax.broadcasted_iota(INDEX_DTYPE, c_h.shape, 1)
        key = jnp.where(c_h != 0, lanes, n)
        sc, sw, tr = _prune_select_lanes(key, c_h, n, S)
        return sc, sw

    ms = slope_bench(full)
    print(f"+ dense prune/select:      {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
