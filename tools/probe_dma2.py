"""Probe 2: slope-timed gather rates + DMA-copy compile matrix.

Timing through the axon tunnel is only trustworthy as a SLOPE: run the op
K times inside one jit (data-dependent chain so XLA cannot CSE), fetch a
checksum (device->host forces completion), and report
(T(k2)-T(k1))/(k2-k1).  This cancels the ~28ms RTT and any constant
dispatch overhead.

Variants:
  take[W]        — XLA row gather
  pipe[W]        — Pallas BlockSpec index-map gather ((1,W) blocks DMA'd by
                   the Mosaic pipeline; known (8,x) read amplification)
  dma[W,align]   — manual make_async_copy per row; align=8 restricts row
                   starts to multiples of 8 (compile matrix: which forms
                   Mosaic accepts)
  dma-run8[W]    — one DMA per 8 consecutive rows
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def slope_time(build_fn, ks=(2, 10), iters=3):
    """build_fn(k) -> jitted fn(args)->scalar; returns ms per single op."""
    times = {}
    for k in ks:
        f = build_fn(k)
        float(f())  # warmup/compile
        ts = []
        for _ in range(iters):
            t0 = time.monotonic()
            float(f())
            ts.append((time.monotonic() - t0) * 1e3)
        ts.sort()
        times[k] = ts[len(ts) // 2]
    k1, k2 = ks
    return (times[k2] - times[k1]) / (k2 - k1)


def make_take(src, idx, k):
    @jax.jit
    def f():
        def body(carry, _):
            i, acc = carry
            out = jnp.take(src, i, axis=0)
            return (jnp.roll(i, 1), acc + jnp.sum(out)), None

        (_, acc), _ = jax.lax.scan(body, (idx, 0.0), None, length=k)
        return acc

    return f


def _pipe_gather(src, idx, w: int, bundle: int = 8):
    """BlockSpec index-map gather: out row g*bundle+j = src[idx[...]]."""

    def kernel(idx_ref, *refs):
        out_ref = refs[-1]
        for j in range(bundle):
            out_ref[j, :] = refs[j][0, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(idx.shape[0] // bundle,),
        in_specs=[
            pl.BlockSpec(
                (1, w),
                (lambda j: (lambda g, i: (i[g * bundle + j], 0)))(j),
                memory_space=pltpu.VMEM,
            )
            for j in range(bundle)
        ],
        out_specs=pl.BlockSpec(
            (bundle, w), lambda g, i: (g, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((idx.shape[0], w), jnp.float32),
    )(idx, *([src] * bundle))


def make_pipe(src, idx, w, k):
    @jax.jit
    def f():
        def body(carry, _):
            i, acc = carry
            out = _pipe_gather(src, i, w)
            return (jnp.roll(i, 1), acc + jnp.sum(out)), None

        (_, acc), _ = jax.lax.scan(body, (idx, 0.0), None, length=k)
        return acc

    return f


def _dma_gather(src, idx, w: int, br: int, run: int = 1):
    def kernel(idx_ref, src_ref, out_ref, sems):
        g = pl.program_id(0)
        for j in range(br):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(idx_ref[g * br + j], run)],
                out_ref.at[pl.ds(j * run, run)],
                sems.at[j],
            ).start()
        for j in range(br):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(idx_ref[g * br + j], run)],
                out_ref.at[pl.ds(j * run, run)],
                sems.at[j],
            ).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(idx.shape[0] // br,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (br * run, w), lambda g, i: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((br,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((idx.shape[0] * run, w), jnp.float32),
    )(idx, src)


def make_dma(src, idx, w, br, run, k):
    @jax.jit
    def f():
        def body(carry, _):
            i, acc = carry
            out = _dma_gather(src, i, w, br, run)
            return (jnp.roll(i, 1), acc + jnp.sum(out)), None

        (_, acc), _ = jax.lax.scan(body, (idx, 0.0), None, length=k)
        return acc

    return f


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    total = 16 << 20  # 16M elements per gather
    nsrc = 1 << 18

    for w in (128, 256, 512):
        r = total // w
        src = jnp.asarray(rng.random((nsrc, w)).astype(np.float32))
        idx_any = jnp.asarray(
            rng.integers(0, nsrc - 8, size=r).astype(np.int32)
        )
        idx_al8 = jnp.asarray(
            (rng.integers(0, (nsrc - 8) // 8, size=r) * 8).astype(np.int32)
        )

        try:
            ms = slope_time(partial(make_take, src, idx_any))
            print(
                f"take    w={w:4d}         {ms:8.2f} ms "
                f"{total/ms/1e3:9.1f} M elem/s",
                flush=True,
            )
        except Exception as e:
            print(f"take w={w} FAIL: {str(e).splitlines()[0][:120]}")

        try:
            ms = slope_time(partial(make_pipe, src, idx_any, w))
            print(
                f"pipe    w={w:4d}         {ms:8.2f} ms "
                f"{total/ms/1e3:9.1f} M elem/s",
                flush=True,
            )
        except Exception as e:
            print(f"pipe w={w} FAIL: {str(e).splitlines()[0][:160]}", flush=True)

        for name, idx, run in (
            ("dma-any ", idx_any, 1),
            ("dma-al8 ", idx_al8, 1),
        ):
            try:
                ms = slope_time(partial(make_dma, src, idx, w, 16, run))
                print(
                    f"{name}w={w:4d}         {ms:8.2f} ms "
                    f"{total/ms/1e3:9.1f} M elem/s",
                    flush=True,
                )
            except Exception as e:
                print(
                    f"{name}w={w} FAIL: {str(e).splitlines()[0][:160]}",
                    flush=True,
                )
        # run-coalesced
        try:
            idx8 = jnp.asarray(
                (rng.integers(0, (nsrc - 8) // 8, size=r // 8) * 8).astype(
                    np.int32
                )
            )
            ms = slope_time(partial(make_dma, src, idx8, w, 8, 8))
            print(
                f"dma-run8 w={w:4d}        {ms:8.2f} ms "
                f"{total/ms/1e3:9.1f} M elem/s",
                flush=True,
            )
        except Exception as e:
            print(f"dma-run8 w={w} FAIL: {str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    main()
