"""Probe: hub B-densify cost anatomy (the real 12 ms at s14).

zeros+linear-scatter of 120k entries into a (16384, 16384) f32 slab
measures ~12 ms = 85 GB/s — 10x below stream roofline.  Find out where:
zeros materialization alone, scatter alone, bf16 build, halved K.

Usage: python tools/probe_bdense2.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sparse_matrix_with_flops_tpu.utils.timing import slope_bench

    k = n = 16384
    rng = np.random.default_rng(0)
    bnnz = 120_000
    lin = jnp.asarray(rng.choice(k * n, size=bnnz, replace=False).astype(np.int64))
    bval = jnp.asarray(rng.random(bnnz).astype(np.float32) + 0.1)
    print(f"backend={jax.default_backend()} K=N={k} bnnz={bnnz}", flush=True)

    ms = slope_bench(lambda x: jnp.full((k * n,), 0.0, jnp.float32) + x)
    print(f"zeros(1G f32)+x:            {ms:8.2f} ms", flush=True)

    ms = slope_bench(
        lambda x: jnp.zeros((k * n,), jnp.float32).at[lin].set(bval + x)
    )
    print(f"zeros+set f32 (1-D lin):    {ms:8.2f} ms", flush=True)

    ms = slope_bench(
        lambda x: jnp.zeros((k * n,), jnp.bfloat16)
        .at[lin]
        .set((bval + x).astype(jnp.bfloat16))
    )
    print(f"zeros+set bf16:             {ms:8.2f} ms", flush=True)

    ms = slope_bench(
        lambda x: jnp.zeros((k * n // 2,), jnp.float32).at[
            jnp.clip(lin, 0, k * n // 2 - 1)
        ].set(bval + x)
    )
    print(f"zeros+set f32, half size:   {ms:8.2f} ms", flush=True)

    r2 = jnp.asarray((np.asarray(lin) // n).astype(np.int32))
    c2 = jnp.asarray((np.asarray(lin) % n).astype(np.int32))
    ms = slope_bench(
        lambda x: jnp.zeros((k, n), jnp.float32).at[r2, c2].set(bval + x)
    )
    print(f"zeros+set f32 (2-D rc):     {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
