"""Probe: can manual Pallas DMA gathers beat XLA's row-gather engine?

Round-1 measured XLA row gathers (jnp.take axis=0) at ~450M elem/s — the
binding constraint on the ELL-ESC tile-assembly phase.  This probe measures
the same access pattern implemented as per-row `pltpu.make_async_copy`
DMAs from an HBM-resident source, with BR DMAs in flight per grid step,
plus the limiting rates on either side:

  memcpy        — contiguous HBM->HBM copy (bandwidth ceiling)
  take[W]       — XLA row gather at width W (round-1 baseline)
  dma[W,BR]     — manual per-row DMA gather, BR rows per grid step
  dma-run8[W]   — one DMA per 8 CONSECUTIVE rows (descriptor amortization
                  ceiling for run-coalesced plans)
  dma-issue     — same-source tiny (1,128) DMAs: pure issue+completion rate

All report ms and M elem/s after subtracting the measured dispatch floor
(the axon tunnel charges ~40ms per dispatch).
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

from sparse_matrix_with_flops_tpu.utils.timing import bench_fn

FLOOR_MS = [0.0]


def report(name, ms, elems):
    net = max(ms - FLOOR_MS[0], 1e-3)
    print(
        f"{name:26s} {ms:9.2f} ms  (net {net:8.2f})  "
        f"{elems / net / 1e3:10.1f} M elem/s",
        flush=True,
    )


def measure_floor():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((128, 128), jnp.float32)
    ms = bench_fn(f, x, warmup=2, iters=5)
    FLOOR_MS[0] = ms
    print(f"dispatch floor: {ms:.2f} ms", flush=True)


def _dma_gather(src, idx, w: int, br: int, run: int = 1):
    """out[i] = src[idx[i]] rows; br row-DMAs in flight per grid step.

    run>1: each DMA copies `run` consecutive rows (idx indexes run-blocks).
    """
    r = idx.shape[0] * run

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
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (br * run, w), lambda g, i: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((br,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, w), jnp.float32),
    )(idx, src)


def main():
    print("backend:", jax.default_backend(), flush=True)
    measure_floor()
    rng = np.random.default_rng(0)

    # bandwidth ceiling: contiguous copy of 128M f32 (512MB)
    big = jnp.asarray(rng.random((1 << 20, 128)).astype(np.float32))
    ms = bench_fn(jax.jit(lambda x: x * 2.0), big, warmup=1, iters=3)
    report("memcpy-ish 128M f32", ms, big.size)

    total = 32 << 20  # 32M elements gathered per variant
    nsrc_rows = 1 << 19
    for w in (64, 128, 256, 512):
        r = total // w
        src = jnp.asarray(
            rng.random((nsrc_rows, w)).astype(np.float32)
        )
        idx = jnp.asarray(
            rng.integers(0, nsrc_rows - 8, size=r).astype(np.int32)
        )
        ms = bench_fn(
            jax.jit(lambda i, s: jnp.take(s, i, axis=0)), idx, src,
            warmup=1, iters=3,
        )
        report(f"take w={w}", ms, total)
        for br in (8, 16, 32):
            try:
                f = jax.jit(partial(_dma_gather, w=w, br=br))
                ms = bench_fn(f, src, idx, warmup=1, iters=3)
                report(f"dma w={w} br={br}", ms, total)
            except Exception as e:
                print(
                    f"dma w={w} br={br} FAIL: "
                    f"{str(e).splitlines()[0][:140]}",
                    flush=True,
                )
        # run-coalesced: 1 DMA per 8 consecutive rows
        try:
            idx8 = jnp.asarray(
                rng.integers(0, nsrc_rows // 8 - 1, size=r // 8).astype(
                    np.int32
                )
                * 8
            )
            f = jax.jit(partial(_dma_gather, w=w, br=8, run=8))
            ms = bench_fn(f, src, idx8, warmup=1, iters=3)
            report(f"dma-run8 w={w}", ms, total)
        except Exception as e:
            print(f"dma-run8 w={w} FAIL: {str(e).splitlines()[0][:140]}")

    # pure issue rate: 512k tiny (1,128) DMAs
    src = jnp.asarray(rng.random((nsrc_rows, 128)).astype(np.float32))
    idx = jnp.asarray(
        rng.integers(0, nsrc_rows - 8, size=1 << 19).astype(np.int32)
    )
    try:
        f = jax.jit(partial(_dma_gather, w=128, br=16))
        ms = bench_fn(f, src, idx, warmup=1, iters=3)
        n = idx.shape[0]
        net = max(ms - FLOOR_MS[0], 1e-3)
        print(
            f"dma-issue 512k x (1,128): {ms:.2f} ms "
            f"-> {n / net / 1e3:.2f} M DMA/s",
            flush=True,
        )
    except Exception as e:
        print(f"dma-issue FAIL: {str(e).splitlines()[0][:140]}")


if __name__ == "__main__":
    main()
