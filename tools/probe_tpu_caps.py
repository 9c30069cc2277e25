"""Capability + speed probes that decide the SpGEMM kernel architecture.

XLA probes: row-gather throughput, minor-axis sort throughput.
Pallas probes: dynamic sublane slicing, traced-shift roll, SMEM scalar
blocks, revisited output blocks.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_matrix_with_flops_tpu.utils.timing import bench_fn


def t(name, fn, *args):
    try:
        f = jax.jit(fn)
        ms = bench_fn(f, *args, warmup=1, iters=3)
        print(f"{name:34s} {ms:9.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:34s} FAIL: {str(e).splitlines()[0][:120]}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # --- XLA probes -------------------------------------------------------
    src = jnp.asarray(rng.random((200_000, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 200_000, size=150_000).astype(np.int32))
    t("row-gather [150k,128]", lambda i, s: jnp.take(s, i, axis=0), idx, src)

    srci = jnp.asarray(rng.integers(0, 1 << 30, size=(16384, 1024)).astype(np.int32))
    srcv = jnp.asarray(rng.random((16384, 1024)).astype(np.float32))
    t(
        "sort minor axis (16k,1024) k+v",
        lambda k, v: jax.lax.sort((k, v), dimension=1, num_keys=1),
        srci,
        srcv,
    )
    srci2 = jnp.asarray(rng.integers(0, 1 << 30, size=(1281024 // 8, 128)).astype(np.int32)) if False else None

    # cumsum along minor axis
    t("cumsum minor (16k,1024)", lambda v: jnp.cumsum(v, axis=1), srcv)

    # --- Pallas probes ----------------------------------------------------
    # (a) dynamic sublane slice: out[i] = table[start[i] : start[i]+8]
    table = jnp.asarray(rng.random((4096, 128)).astype(np.float32))

    def dyn_sublane_kernel(start_ref, table_ref, o_ref):
        s = start_ref[0]
        o_ref[:] = table_ref[pl.ds(s, 8), :]

    def dyn_sublane(start):
        return pl.pallas_call(
            dyn_sublane_kernel,
            grid=(4,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda g: (g, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((4096, 128), lambda g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
        )(start, table)

    starts = jnp.asarray([[5], [77], [130], [1000]], dtype=jnp.int32)
    try:
        out = jax.jit(dyn_sublane)(starts)
        ref = np.stack([np.asarray(table)[s : s + 8] for s in [5, 77, 130, 1000]]).reshape(32, 128)
        ok = np.allclose(np.asarray(out), ref)
        print(f"{'pallas dyn-sublane slice':34s} {'OK' if ok else 'WRONG'}", flush=True)
    except Exception as e:
        print(f"{'pallas dyn-sublane slice':34s} FAIL: {str(e).splitlines()[0][:120]}", flush=True)

    # (b) traced-shift roll
    def roll_kernel(sh_ref, x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], sh_ref[0], axis=1)

    def dyn_roll(sh, x):
        return pl.pallas_call(
            roll_kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(sh, x)

    x = jnp.asarray(rng.random((8, 128)).astype(np.float32))
    try:
        out = jax.jit(dyn_roll)(jnp.asarray([3], jnp.int32), x)
        ok = np.allclose(np.asarray(out), np.roll(np.asarray(x), 3, axis=1))
        print(f"{'pallas traced-shift roll':34s} {'OK' if ok else 'WRONG'}", flush=True)
    except Exception as e:
        print(f"{'pallas traced-shift roll':34s} FAIL: {str(e).splitlines()[0][:120]}", flush=True)

    # (c) revisited output block accumulate
    def acc_kernel(x_ref, o_ref):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += x_ref[:]

    def acc(x):
        return pl.pallas_call(
            acc_kernel,
            grid=(4,),
            in_specs=[pl.BlockSpec((8, 128), lambda k: (k, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda k: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)

    x4 = jnp.asarray(rng.random((32, 128)).astype(np.float32))
    try:
        out = jax.jit(acc)(x4)
        ok = np.allclose(np.asarray(out), np.asarray(x4).reshape(4, 8, 128).sum(0), atol=1e-5)
        print(f"{'pallas revisited out block':34s} {'OK' if ok else 'WRONG'}", flush=True)
    except Exception as e:
        print(f"{'pallas revisited out block':34s} FAIL: {str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()


# NOTE: two follow-up probe rounds (sort-envelope sweep, gather width
# sweep) once lived in probe_tpu_caps2/3.py; their conclusions are folded
# into docs/ROUND1_NOTES.md and the memory notes driving ops/ell_esc.py.
# probe_dma2.py supersedes them with slope-based timing (the tunnel's
# block_until_ready is not a reliable completion signal).
