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


# ---------------------------------------------------------------------------
# in-kernel lane-axis primitives (formerly ops/pallas_esc.py, whose
# VMEM-resident-B tile pipeline was deleted after failing Mosaic
# compilation on real v5e hardware at every tested scale — see
# docs/ROUND2_NOTES.md "pallas_esc decision")
# ---------------------------------------------------------------------------
def _roll(x, shift: int, width: int):
    """pltpu.roll with negative shifts normalised (roll requires >= 0)."""
    return pltpu.roll(x, shift % width, axis=1)


def _bitonic_sort_lanes(key, val, width: int):
    """Ascending bitonic sort of each row's ``width`` lanes by ``key``,
    carrying ``val``.  Pure roll/select VPU ops (bitonic_sort.cuh role)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
    k = 2
    while k <= width:
        j = k // 2
        while j >= 1:
            is_lo = (lane & j) == 0
            pk = jnp.where(
                is_lo, _roll(key, -j, width), _roll(key, j, width)
            )
            pv = jnp.where(
                is_lo, _roll(val, -j, width), _roll(val, j, width)
            )
            asc = (lane & k) == 0
            lo_k = jnp.where(is_lo, key, pk)
            hi_k = jnp.where(is_lo, pk, key)
            # logical form: Mosaic rejects select between i1 vectors
            do_swap = (asc & (lo_k > hi_k)) | (~asc & (lo_k < hi_k))
            key = jnp.where(do_swap, pk, key)
            val = jnp.where(do_swap, pv, val)
            j //= 2
        k *= 2
    return key, val


def _run_sums(col, val, width: int):
    """Inclusive within-run prefix sums along lanes (runs = equal sorted
    cols); the lane-parallel ReduceByKey (mindex2-cuda/kernel.cu:248)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, col.shape, 1)
    d = 1
    while d < width:
        pc = pltpu.roll(col, d, axis=1)
        pv = pltpu.roll(val, d, axis=1)
        val = val + jnp.where((lane >= d) & (pc == col), pv, 0.0)
        d *= 2
    return val


def _bitonic_sort_packed(key, val, width: int, presorted: int = 1):
    """Bitonic sort with key+val stacked into one (2R, W) tile so each
    compare-exchange issues 2 rolls instead of 4 (roll bytes are the same;
    instruction count halves).

    ``presorted`` skips the first log2(presorted) stages: the caller
    promises every aligned ``presorted``-lane run is already sorted, runs
    alternating ascending/descending by run-index parity (even runs
    ascending — the invariant this network leaves after its own stage
    k=presorted).  ELL-ESC tiles are concatenations of column-sorted
    B-row chunks, so with odd chunks lane-reversed the sort starts at
    k=2*chunk — the W==chunk bins skip the network entirely."""
    r = key.shape[0]
    x = jnp.concatenate(
        [key, pltpu.bitcast(val, jnp.int32)], axis=0
    )  # (2R, W)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = max(2, 2 * presorted)
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


def _shift_nonkeep(keep, width: int):
    """Per lane: number of non-keep lanes strictly before it (= the left
    shift each survivor must travel under stable compaction).  Hillis-
    Steele inclusive scan, log(width) roll+add passes."""
    lane = jax.lax.broadcasted_iota(jnp.int32, keep.shape, 1)
    z = (~keep).astype(jnp.int32)
    incl = z
    d = 1
    while d < width:
        incl = incl + jnp.where(lane >= d, pltpu.roll(incl, d, axis=1), 0)
        d *= 2
    return incl - z  # exclusive scan


def _compact_left_packed(x, keep, width: int):
    """Stable left-compaction of ``keep`` lanes in log(width) pull passes
    (the warp-ballot stream compaction of GPU lore, on VPU lanes).

    ``x`` is a packed (2R, W) tile (key rows stacked over value rows);
    ``keep`` is (R, W).  Monotone routing (shift non-decreasing in lane)
    guarantees pulls never overwrite a settled survivor; lanes beyond the
    per-row survivor count hold garbage and must be masked by the caller.
    Replaces a second full bitonic sort: ~2·log(W) passes vs ~log²(W)/2.
    """
    r = keep.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, keep.shape, 1)
    sh = jnp.where(keep, _shift_nonkeep(keep, width), 0)
    d = 1
    while d < width:
        xs = _roll(x, -d, width)
        shs = pltpu.roll(sh, (-d) % width, axis=1)
        cond = ((shs & d) != 0) & (lane + d < width)
        x = jnp.where(jnp.concatenate([cond, cond], axis=0), xs, x)
        sh = jnp.where(cond, shs - d, sh)
        d *= 2
    return x


def _sdc_kernel(
    tc_ref, tv_ref, kout_ref, vout_ref, *, W: int, ncols: int,
    presorted: int = 1,
):
    col = tc_ref[:]
    val = tv_ref[:]
    r = col.shape[0]
    col, val = _bitonic_sort_packed(col, val, W, presorted=presorted)
    val = _run_sums(col, val, W)
    lane = jax.lax.broadcasted_iota(jnp.int32, col.shape, 1)
    nxt = _roll(col, -1, W)
    is_last = (col != nxt) | (lane == W - 1)
    keep = is_last & (col < ncols)
    cnt = jnp.sum(keep.astype(jnp.int32), axis=1, keepdims=True)
    x = jnp.concatenate([col, pltpu.bitcast(val, jnp.int32)], axis=0)
    x = _compact_left_packed(x, keep, W)
    live = lane < cnt
    kout_ref[:] = jnp.where(live, x[:r], ncols)
    vout_ref[:] = jnp.where(
        live, pltpu.bitcast(x[r:], jnp.float32), 0.0
    )


@partial(
    jax.jit,
    static_argnames=("ncols", "interpret", "rows_per_step", "presorted"),
)
def sort_dedup_compact(
    tc: jax.Array,
    tv: jax.Array,
    ncols: int,
    interpret: bool = False,
    rows_per_step: int = 8,
    presorted: int = 1,
):
    """[R, W] product tile -> (compacted cols, summed vals); R % 8 == 0.

    ``presorted > 1``: aligned presorted-lane runs are sorted, directions
    alternating by run parity (see _bitonic_sort_packed)."""
    r, w = tc.shape
    kern = partial(_sdc_kernel, W=w, ncols=ncols, presorted=presorted)
    grid = (r // rows_per_step,)
    blk = lambda g: (g, 0)
    # W=32768 needs ~18.2 MB of scoped VMEM at the minimum 8 rows/step —
    # past Mosaic's conservative 16 MB default but well inside the v5e's
    # 128 MB physical VMEM; raise the limit only for the wide classes
    # (the XLA-sort fallback is NOT an alternative on TPU: lax.sort +
    # associative_scan at these widths never finished compiling on-chip,
    # round-4 probe logs)
    params = None
    if w > 16384 and not interpret:
        params = pltpu.CompilerParams(vmem_limit_bytes=64 << 20)
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
        **({"compiler_params": params} if params else {}),
    )(tc, tv)


def _align_kernel(g_ref, off_ref, c_ref, v_ref, *, W: int):
    g = g_ref[:]  # (R, 4W) i32: [cols0 | valbits0 | cols1 | valbits1]
    off = off_ref[:]  # (R, 1) i32 in [0, W)
    r = g.shape[0]
    gc = jnp.concatenate([g[:, :W], g[:, 2 * W : 3 * W]], axis=1)
    gv = jnp.concatenate([g[:, W : 2 * W], g[:, 3 * W :]], axis=1)
    x = jnp.concatenate([gc, gv], axis=0)  # (2R, 2W)
    bit = 1
    while bit < W:
        sel = (off & bit) != 0
        sel2 = jnp.concatenate([sel, sel], axis=0)
        x = jnp.where(sel2, _roll(x, -bit, 2 * W), x)
        bit *= 2
    c_ref[:] = x[:r, :W]
    v_ref[:] = x[r:, :W]


@partial(jax.jit, static_argnames=("interpret", "rows_per_step"))
def align_windows(
    g: jax.Array,
    off: jax.Array,
    interpret: bool = False,
    rows_per_step: int = 8,
):
    """Variable left-roll of straddled window pairs, VMEM-resident.

    ``g`` is [Q, 4W] int32 — each row the concatenation of two adjacent
    W-lane source windows in [cols | val-bits | cols | val-bits] order;
    ``off`` is [Q, 1] with the within-window start offset.  Returns the
    aligned ([Q, W] cols, [Q, W] val-bits) starting at ``off``.  The XLA
    formulation pays log2(W) full HBM round trips for the conditional
    rolls (~2.4 GB at s14); here the passes run in VMEM — one read, one
    write (ops/ell_esc._assemble_body's window export).  An unaligned
    `lax.gather` slice formulation beats this 3.7x on sources that fit
    VMEM but collapses ~40x above it (tools/probe_wingather.py), so the
    take+align pair is the production path."""
    q, w4 = g.shape
    w = w4 // 4
    kern = partial(_align_kernel, W=w)
    grid = (q // rows_per_step,)
    blk = lambda i: (i, 0)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows_per_step, w4), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_step, 1), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows_per_step, w), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_step, w), blk, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q, w), jnp.int32),
            jax.ShapeDtypeStruct((q, w), jnp.int32),
        ),
        interpret=interpret,
    )(g, off)


def _compact_rows_kernel(v_ref, kout_ref, vout_ref, *, N: int, ncols: int):
    val = v_ref[:]
    r = val.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, val.shape, 1)
    keep = (val != 0) & (lane < ncols)
    cnt = jnp.sum(keep.astype(jnp.int32), axis=1, keepdims=True)
    x = jnp.concatenate([lane, pltpu.bitcast(val, jnp.int32)], axis=0)
    x = _compact_left_packed(x, keep, N)
    live = lane < cnt
    kout_ref[:] = jnp.where(live, x[:r], ncols)
    vout_ref[:] = jnp.where(live, pltpu.bitcast(x[r:], jnp.float32), 0.0)


@partial(jax.jit, static_argnames=("ncols", "interpret", "rows_per_step"))
def compact_nonzero_rows(
    vals: jax.Array,
    ncols: int,
    interpret: bool = False,
    rows_per_step: int = 8,
):
    """Dense [R, N] rows -> (cols, vals) with nonzeros compacted to the
    lane front in column order (N = padded width >= ncols; lanes beyond
    ncols are ignored).  The hub-row compaction: dense rows are already
    column-ordered, so no sort is needed — just the log-N shift
    compaction (vs a full ~log²N bitonic).  R % rows_per_step == 0."""
    r, n = vals.shape
    kern = partial(_compact_rows_kernel, N=n, ncols=ncols)
    grid = (r // rows_per_step,)
    blk = lambda g: (g, 0)
    # width 65536 needs ~26 MB of scoped VMEM at 8 rows/step (131072:
    # ~52 MB) — past Mosaic's conservative 16 MB default but well inside
    # the v5e's 128 MB physical; raising it replaces the XLA lane-sort
    # fallback for s16/s17-class hub rows (the fallback measured 550 ms
    # of the 786 ms s16 kernel, tools/profile_fused.py round 4; both
    # widths compile AND validate on-chip, round-4 probes)
    params = None
    if n > 32768 and not interpret:
        params = pltpu.CompilerParams(vmem_limit_bytes=96 << 20)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows_per_step, n), blk, memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((rows_per_step, n), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_step, n), blk, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, n), jnp.int32),
            jax.ShapeDtypeStruct((r, n), jnp.float32),
        ),
        interpret=interpret,
        **({"compiler_params": params} if params else {}),
    )(vals)
