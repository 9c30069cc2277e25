"""Pallas sort–dedup–compact for ELL-ESC row tiles.

The hot interior of the ELL-ESC pipeline is "sort each row's W lanes by
column, sum duplicate runs, compact survivors to the front".  The XLA
version pays two full `lax.sort` HBM round-trips; this kernel does the
whole thing in VMEM per (8, W) tile: a lane-axis bitonic network (the
nlibs/bitonic_sort.cuh:18-88 role), a log-step segmented run-sum
(ReduceByKey, mindex2-cuda/kernel.cu:248), and a second bitonic pass for
compaction — ~200 VPU passes over data that never leaves VMEM.

No dynamic indexing anywhere: blocks are statically tiled, which is what
makes this kernel Mosaic-clean (unlike per-entry dynamic slicing).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_esc import _bitonic_sort_lanes, _roll, _run_sums


def _bitonic_sort_packed(key, val, width: int):
    """Bitonic sort with key+val stacked into one (2R, W) tile so each
    compare-exchange issues 2 rolls instead of 4 (roll bytes are the same;
    instruction count halves)."""
    r = key.shape[0]
    x = jnp.concatenate(
        [key, pltpu.bitcast(val, jnp.int32)], axis=0
    )  # (2R, W)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 2
    while k <= width:
        j = k // 2
        while j >= 1:
            is_lo = (lane & j) == 0
            p = jnp.where(
                is_lo, _roll(x, -j, width), _roll(x, j, width)
            )
            kk = x[:r]
            pk = p[:r]
            asc = (lane[:r] & k) == 0
            is_lo_k = is_lo[:r]
            lo_k = jnp.where(is_lo_k, kk, pk)
            hi_k = jnp.where(is_lo_k, pk, kk)
            do_swap = (asc & (lo_k > hi_k)) | (~asc & (lo_k < hi_k))
            x = jnp.where(
                jnp.concatenate([do_swap, do_swap], axis=0), p, x
            )
            j //= 2
        k *= 2
    return x[:r], pltpu.bitcast(x[r:], jnp.float32)


def _sdc_kernel(tc_ref, tv_ref, kout_ref, vout_ref, *, W: int, ncols: int):
    col = tc_ref[:]
    val = tv_ref[:]
    col, val = _bitonic_sort_packed(col, val, W)
    val = _run_sums(col, val, W)
    lane = jax.lax.broadcasted_iota(jnp.int32, col.shape, 1)
    nxt = _roll(col, -1, W)
    is_last = (col != nxt) | (lane == W - 1)
    keep = is_last & (col < ncols)
    key2 = jnp.where(keep, col, ncols)
    key2, val2 = _bitonic_sort_packed(key2, val, W)
    kout_ref[:] = key2
    vout_ref[:] = jnp.where(key2 < ncols, val2, 0.0)


@partial(jax.jit, static_argnames=("ncols", "interpret", "rows_per_step"))
def sort_dedup_compact(
    tc: jax.Array,
    tv: jax.Array,
    ncols: int,
    interpret: bool = False,
    rows_per_step: int = 8,
):
    """[R, W] product tile -> (compacted cols, summed vals); R % 8 == 0."""
    r, w = tc.shape
    kern = partial(_sdc_kernel, W=w, ncols=ncols)
    grid = (r // rows_per_step,)
    blk = lambda g: (g, 0)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows_per_step, w), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_step, w), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows_per_step, w), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_step, w), blk, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, w), jnp.int32),
            jax.ShapeDtypeStruct((r, w), jnp.float32),
        ),
        interpret=interpret,
    )(tc, tv)
