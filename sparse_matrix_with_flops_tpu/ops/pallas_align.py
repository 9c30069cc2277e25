"""Pallas window-align gather: the flat-CSR export engine.

The export needs out[q] = flat[idx0(w) + (q - 16w)] for each 16-element
output window w — a gather whose indices are affine within windows.  In
XLA the aligned-window formulation either pays element-granularity gathers
or materialises narrow-lane intermediates that Mosaic/XLA pad 8x (OOM at
scale 16).  Here the scalar-prefetched window row indices drive BlockSpec
index maps (the pipeline DMAs exactly the two 128-lane source rows each
window straddles), and a dynamic roll aligns them — no padded
intermediates, no select chains.

Each grid step produces one 128-lane output row = 8 windows; the source
array is passed 16 times with per-window index maps (lo/hi row per
window).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _align_kernel(wr_ref, off_ref, *refs):
    # refs: 16 source row blocks (lo0, hi0, lo1, hi1, ... lo7, hi7), out
    out_ref = refs[-1]
    g = pl.program_id(0)
    for j in range(8):
        lo = refs[2 * j][:]  # (1, 128)
        hi = refs[2 * j + 1][:]
        cat = jnp.concatenate([lo, hi], axis=1)  # (1, 256)
        o = off_ref[8 * g + j]
        rolled = pltpu.roll(cat, (256 - o) % 256, axis=1)
        out_ref[0, 16 * j : 16 * (j + 1)] = rolled[0, :16]


@partial(jax.jit, static_argnames=("interpret",))
def window_align_gather(src2d, wr, off, interpret: bool = False):
    """out[16w + t] = src2d.flat[wr[w]*128 + off[w] + t] for t in [0, 16).

    src2d: [R, 128]; wr: int32[Q] source row of each window (wr+1 must be
    a valid row — pad src2d by one row); off: int32[Q] lane offset.
    Returns [Q * 16] flat (as [Q*16//128, 128]).
    """
    q = wr.shape[0]
    assert q % 8 == 0
    grid = (q // 8,)

    def lo_map(j):
        return lambda g, wr_ref, off_ref: (wr_ref[8 * g + j], 0)

    def hi_map(j):
        return lambda g, wr_ref, off_ref: (wr_ref[8 * g + j] + 1, 0)

    in_specs = []
    for j in range(8):
        in_specs.append(
            pl.BlockSpec((1, 128), lo_map(j), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec((1, 128), hi_map(j), memory_space=pltpu.VMEM)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 128), lambda g, *_: (g, 0)),
    )
    out = pl.pallas_call(
        _align_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q // 8, 128), src2d.dtype),
        interpret=interpret,
    )(wr, off, *([src2d] * 16))
    return out.reshape(-1)
