"""Pallas single-pass prefix scan for long 1-D int32 arrays.

XLA lowers a long ``jnp.cumsum`` to O(log n) shifted-add passes, each a
full HBM round trip — ~24 passes at nnz(C) scale.
This kernel reads and writes the array ONCE: the sequential TPU grid
carries the running total in SMEM scratch across block steps, and each
block does its local scan entirely in VMEM (lane-axis Hillis-Steele +
sublane-axis row-offset scan).

The framework's prefixSum.h / prefixSum64 counterpart (SURVEY §2.1) for
device-side megascale scans; host planning still uses numpy cumsums.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK_R = 512  # sublanes per block step
_BLK_L = 128  # lanes


def _scan_kernel(x_ref, o_ref, carry, *, R: int, L: int):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        carry[0] = 0

    x = x_ref[:]  # (R, L) i32, row-major flattened order
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    incl = x
    d = 1
    while d < L:
        incl = incl + jnp.where(lane >= d, pltpu.roll(incl, d, axis=1), 0)
        d *= 2
    # exclusive scan of row totals down the sublanes
    tot = incl[:, L - 1 : L]  # (R, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, tot.shape, 0)
    ex = tot
    d = 1
    while d < R:
        ex = ex + jnp.where(row >= d, pltpu.roll(ex, d, axis=0), 0)
        d *= 2
    ex = ex - tot  # exclusive
    o_ref[:] = incl + ex + carry[0]
    carry[0] = carry[0] + jnp.sum(x)


@partial(jax.jit, static_argnames=("interpret",))
def cumsum_i32(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Inclusive prefix sum of a 1-D int32 array in one HBM pass.

    Pads internally to a multiple of the block size; returns x.shape.
    """
    (n,) = x.shape
    blk = _BLK_R * _BLK_L
    npad = -(-max(n, 1) // blk) * blk
    xp = x
    if npad != n:
        xp = jnp.concatenate([x, jnp.zeros((npad - n,), jnp.int32)])
    x2 = xp.reshape(-1, _BLK_L)
    nsteps = x2.shape[0] // _BLK_R
    out = pl.pallas_call(
        partial(_scan_kernel, R=_BLK_R, L=_BLK_L),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(
                (_BLK_R, _BLK_L), lambda g: (g, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (_BLK_R, _BLK_L), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(x2)
    return out.reshape(-1)[:n]
