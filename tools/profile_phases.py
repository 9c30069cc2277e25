"""Sub-phase microbenchmarks: where do the 950ms of `expand` go?

Times repeat_segments (scatter+cummax), a searchsorted alternative, raw
17M-element gathers, the lexicographic sort, and the scatter assembly —
on whatever backend is attached.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sparse_matrix_with_flops_tpu.ops.segments import exclusive_cumsum, repeat_segments
from sparse_matrix_with_flops_tpu.ops.spgemm import spgemm_upper_bounds
from sparse_matrix_with_flops_tpu.utils.generate import rmat_csr
from sparse_matrix_with_flops_tpu.utils.timing import bench_fn


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    ef = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    a = rmat_csr(scale, edge_factor=ef, seed=7, weights="random")
    cap, _ = spgemm_upper_bounds(a, a)
    nnz = int(a.nnz)
    print(f"rows={a.rows} nnz={nnz} products={cap} backend={jax.default_backend()}", flush=True)

    ef_arr = jnp.asarray(
        np.diff(np.asarray(a.row_ptr))[
            np.clip(np.asarray(a.col_ind), 0, a.rows - 1)
        ].astype(np.int32)
    )
    starts = exclusive_cumsum(ef_arr)
    valid = jnp.arange(ef_arr.shape[0]) < nnz

    def t(name, fn, *args):
        f = jax.jit(fn)
        ms = bench_fn(f, *args, warmup=1, iters=3)
        print(f"{name:28s} {ms:9.2f} ms", flush=True)

    t("repeat_segments(scatter)", lambda s, v: repeat_segments(s[:-1], v, cap), starts, valid)
    t(
        "searchsorted variant",
        lambda s: jnp.searchsorted(
            s, jnp.arange(cap, dtype=jnp.int32), side="right"
        ).astype(jnp.int32)
        - 1,
        starts,
    )
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, nnz, size=cap).astype(np.int32)
    )
    src = jnp.asarray(np.random.default_rng(1).random(nnz).astype(np.float32))
    t("gather 17M from 120k", lambda i, s: jnp.take(s, i), idx, src)
    big = jnp.asarray(np.random.default_rng(2).random(cap).astype(np.float32))
    bigidx = jnp.asarray(
        np.random.default_rng(3).integers(0, cap, size=cap).astype(np.int32)
    )
    t("gather 17M from 17M", lambda i, s: jnp.take(s, i), bigidx, big)
    keys = jnp.asarray(
        np.random.default_rng(4).integers(0, a.rows, size=cap).astype(np.int32)
    )
    t(
        "sort 17M (2key+1val)",
        lambda k, i, v: jax.lax.sort((k, i, v), num_keys=2),
        keys,
        bigidx,
        big,
    )
    t(
        "scatter-add 17M->17M",
        lambda i, v: jnp.zeros((cap,), jnp.float32).at[i].add(v, mode="drop"),
        bigidx,
        big,
    )
    t("cumsum 17M", lambda v: jnp.cumsum(v), big)


if __name__ == "__main__":
    main()
