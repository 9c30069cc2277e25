"""Pallas fused tile-ESC SpGEMM — the speed-of-light single-chip kernel.

The XLA stream pipeline (ops/spgemm.py) is correct but gather/scatter-bound
on TPU (~1000x off roofline: 17M-product expansion costs ~950ms).  This
kernel rebuilds the reference's fused binned GPU engine
(``sgpu_SpGEMM_mix_mid`` block-per-row shared-memory ESC,
mindex2-cuda/tryOutCompute.cu:97-255, with the bitonic network of
nlibs/bitonic_sort.cuh:18-88) in TPU terms:

* rows are binned by flops into power-of-two product widths W
  (the flops classify of mindex2-cuda/flops.cu:39-47);
* one grid step processes 8 rows (a sublane group) of one bin: for every
  A entry it slices the touched B row segment straight out of VMEM
  (B's col/val arrays are VMEM-resident — no HBM gathers) into a
  (8, W) product tile;
* a lane-axis bitonic network sorts each row's products by column,
  a log-step segmented scan sums duplicate runs, and a second bitonic
  pass compacts survivors to the lane front — all VPU register math,
  zero scatters;
* output is compacted (8, W) col/val tiles; CSR assembly afterwards is
  gather-only.

Rows whose flops exceed the largest width fall back to a plain spgemm on
the (statically sliced) heavy-row submatrix — the 'olarge' escape hatch
(mindex2-cuda/\\:23-143).

Capacity model: B (col+val+row_ptr) must fit in VMEM alongside the tiles,
i.e. nnz(B) up to ~700k per call.  Bigger operands shard across chips
(parallel/) before they hit this limit.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import INDEX_DTYPE, QVALUE_DTYPE
from ..formats.csr import CSR


def _pow2ceil(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


# ---------------------------------------------------------------------------
# in-kernel lane-axis primitives
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


def _esc_tile_kernel(
    ent_bstart_ref,
    ent_len_ref,
    ent_off_ref,
    ent_aval_ref,
    b_col_ref,
    b_val_ref,
    ucol_ref,
    uval_ref,
    buf_c,
    buf_v,
    *,
    W: int,
    SW: int,
    maxE: int,
    ncols: int,
):
    buf_c[:] = jnp.full(buf_c.shape, ncols, jnp.int32)
    buf_v[:] = jnp.zeros(buf_v.shape, jnp.float32)
    lanes_sw = jax.lax.broadcasted_iota(jnp.int32, (1, SW), 1)

    def entry_step(k, carry):
        for r in range(8):
            ln = ent_len_ref[r, k]

            @pl.when(ln > 0)
            def _():
                bs = ent_bstart_ref[r, k]
                off = ent_off_ref[r, k]
                av = ent_aval_ref[r, k]
                c = b_col_ref[0, pl.ds(bs, SW)].reshape(1, SW)
                v = b_val_ref[0, pl.ds(bs, SW)].reshape(1, SW)
                c = jnp.where(lanes_sw < ln, c, ncols)
                v = jnp.where(lanes_sw < ln, v * av, 0.0)
                buf_c[r : r + 1, pl.ds(off, SW)] = c
                buf_v[r : r + 1, pl.ds(off, SW)] = v

        return carry

    jax.lax.fori_loop(0, maxE, entry_step, 0, unroll=False)

    col = buf_c[:, :W]
    val = buf_v[:, :W]
    col, val = _bitonic_sort_lanes(col, val, W)
    val = _run_sums(col, val, W)
    lane = jax.lax.broadcasted_iota(jnp.int32, col.shape, 1)
    nxt = _roll(col, -1, W)
    is_last = (col != nxt) | (lane == W - 1)
    keep = is_last & (col < ncols)
    key2 = jnp.where(keep, col, ncols)
    key2, val = _bitonic_sort_lanes(key2, val, W)
    ucol_ref[:] = key2
    uval_ref[:] = jnp.where(key2 < ncols, val, 0.0)


# ---------------------------------------------------------------------------
# host-side planning
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True, eq=False)
class TileBin:
    row_ids: np.ndarray  # int32[Rpad] (multiple of 8; -1 padding)
    W: int  # product tile width (pow2)
    SW: int  # max B-segment width in bin (pow2, <= W)
    maxE: int  # max entries per row in bin
    ent_bstart: np.ndarray  # int32[Rpad, maxE]
    ent_len: np.ndarray  # int32[Rpad, maxE]
    ent_off: np.ndarray  # int32[Rpad, maxE]
    ent_aidx: np.ndarray  # int32[Rpad, maxE] index into a.values (-1 pad)


@dataclasses.dataclass(frozen=True, eq=False)
class TilePlan:
    """Static dispatch plan; identity-hashed jit static arg (one per
    sparsity structure)."""

    bins: tuple  # tuple[TileBin, ...]
    huge_rows: np.ndarray  # int32[.] rows with flops > max width
    rows: int
    ncols: int
    out_cap: int
    # assembly helpers (static):
    tile_slot: np.ndarray  # int32[rows] slot of row inside its bin (-1)
    bin_of_row: np.ndarray  # int32[rows] bin index (-1 none / -2 huge)
    # heavy-row fallback submatrix structure (static):
    huge_rp: np.ndarray  # int32[len(huge_rows)+1]
    huge_src: np.ndarray  # int32[.] source entry indices in a
    huge_flops: int

    __hash__ = object.__hash__


DEFAULT_TILE_WIDTHS = (128, 512, 2048)


def plan_tiles(
    a: CSR, b: CSR, widths: tuple = DEFAULT_TILE_WIDTHS
) -> TilePlan:
    """Host-side classify + per-entry metadata (gpuFlopsClassify role,
    flops.cu:110-140, with the CPU classifier's bin lists,
    nGpuSpMM.cc:48-83)."""
    rp = np.asarray(a.row_ptr, dtype=np.int64)
    nnz = int(rp[-1])
    acol = np.asarray(a.col_ind)[:nnz]
    brp = np.asarray(b.row_ptr, dtype=np.int64)
    bcounts = np.diff(brp)
    safe = np.clip(acol, 0, b.rows - 1)
    elen = bcounts[safe].astype(np.int64)
    counts_a = np.diff(rp)
    erow = np.repeat(np.arange(a.rows), counts_a)
    rf = np.zeros(a.rows, dtype=np.int64)
    np.add.at(rf, erow, elen)
    rmaxseg = np.zeros(a.rows, dtype=np.int64)
    np.maximum.at(rmaxseg, erow, elen)

    bins = []
    tile_slot = np.full(a.rows, -1, dtype=np.int32)
    bin_of_row = np.full(a.rows, -1, dtype=np.int32)
    lo = 1
    for w in widths:
        sel = np.nonzero((rf >= lo) & (rf <= w))[0]
        lo = w + 1
        if sel.size == 0:
            continue
        b_idx = len(bins)
        maxE = int(counts_a[sel].max())
        SW = _pow2ceil(int(rmaxseg[sel].max()))
        W = w
        pad = (-sel.size) % 8
        row_ids = np.concatenate(
            [sel.astype(np.int32), np.full(pad, -1, np.int32)]
        )
        rpad = row_ids.shape[0]
        ent_bstart = np.zeros((rpad, maxE), np.int32)
        ent_len = np.zeros((rpad, maxE), np.int32)
        ent_off = np.zeros((rpad, maxE), np.int32)
        ent_aidx = np.zeros((rpad, maxE), np.int32)
        for s, row in enumerate(sel):
            e0, e1 = int(rp[row]), int(rp[row + 1])
            ne = e1 - e0
            lens = elen[e0:e1]
            ent_len[s, :ne] = lens
            ent_bstart[s, :ne] = brp[safe[e0:e1]]
            ent_aidx[s, :ne] = np.arange(e0, e1)
            ent_off[s, 1:ne] = np.cumsum(lens)[:-1]
        tile_slot[sel] = np.arange(sel.size, dtype=np.int32)
        bin_of_row[sel] = b_idx
        bins.append(
            TileBin(row_ids, W, SW, maxE, ent_bstart, ent_len, ent_off, ent_aidx)
        )
    huge = np.nonzero(rf > widths[-1])[0].astype(np.int32)
    bin_of_row[huge] = -2
    tile_slot[huge] = np.arange(huge.size, dtype=np.int32)
    # static structure of the heavy-row submatrix (the 'olarge' fallback)
    hlens = (rp[huge + 1] - rp[huge]) if huge.size else np.zeros(0, np.int64)
    huge_rp = np.zeros(huge.size + 1, dtype=np.int64)
    np.cumsum(hlens, out=huge_rp[1:])
    huge_src = (
        np.concatenate(
            [np.arange(rp[r], rp[r + 1]) for r in huge]
        ).astype(np.int32)
        if huge.size
        else np.zeros(0, np.int32)
    )
    huge_flops = int(rf[huge].sum()) if huge.size else 1
    # nnz(C) is bounded per row by min(flops, ncols)
    out_cap = int(np.minimum(rf, b.ncols).sum())
    return TilePlan(
        bins=tuple(bins),
        huge_rows=huge,
        rows=a.rows,
        ncols=b.ncols,
        out_cap=max(out_cap, 1),
        tile_slot=tile_slot,
        bin_of_row=bin_of_row,
        huge_rp=huge_rp.astype(np.int32),
        huge_src=huge_src,
        huge_flops=max(huge_flops, 1),
    )


# ---------------------------------------------------------------------------
# per-bin pallas invocation
# ---------------------------------------------------------------------------
def _run_bin(
    tb: TileBin, a_vals, b_col2, b_val2, ncols: int, interpret: bool
):
    rpad = tb.row_ids.shape[0]
    ent_aval = jnp.take(
        a_vals, jnp.asarray(np.clip(tb.ent_aidx, 0, None))
    ) * (jnp.asarray(tb.ent_len) > 0)
    kern = partial(
        _esc_tile_kernel, W=tb.W, SW=tb.SW, maxE=tb.maxE, ncols=ncols
    )
    grid = (rpad // 8,)
    blk = lambda g: (g, 0)
    full = lambda g: (0, 0)
    ucol, uval = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tb.maxE), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tb.maxE), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tb.maxE), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tb.maxE), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(b_col2.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec(b_val2.shape, full, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, tb.W), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tb.W), blk, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rpad, tb.W), jnp.int32),
            jax.ShapeDtypeStruct((rpad, tb.W), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, tb.W + tb.SW), jnp.int32),
            pltpu.VMEM((8, tb.W + tb.SW), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(tb.ent_bstart),
        jnp.asarray(tb.ent_len),
        jnp.asarray(tb.ent_off),
        ent_aval.astype(jnp.float32),
        b_col2,
        b_val2,
    )
    return ucol, uval


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("plan", "interpret"))
def _spgemm_tiles_impl(a: CSR, b: CSR, plan: TilePlan, interpret: bool):
    ncols = plan.ncols
    m = plan.rows
    # B arrays as (1, N+SWmax) with sentinel/zero padding for slice overrun
    swmax = max((tb.SW for tb in plan.bins), default=1)
    bcap = b.capacity
    b_col2 = jnp.full((1, bcap + swmax), ncols, jnp.int32)
    b_col2 = b_col2.at[0, :bcap].set(b.col_ind)
    b_val2 = jnp.zeros((1, bcap + swmax), jnp.float32)
    b_val2 = b_val2.at[0, :bcap].set(b.values)

    results = []
    for tb in plan.bins:
        results.append(_run_bin(tb, a.values, b_col2, b_val2, ncols, interpret))

    # per-row unique counts
    counts = jnp.zeros((m,), INDEX_DTYPE)
    for tb, (ucol, _) in zip(plan.bins, results):
        c = jnp.sum(ucol < ncols, axis=1).astype(INDEX_DTYPE)
        tgt = jnp.asarray(np.where(tb.row_ids >= 0, tb.row_ids, m))
        counts = counts.at[tgt].add(
            jnp.where(jnp.asarray(tb.row_ids) >= 0, c, 0), mode="drop"
        )

    huge_c = None
    if plan.huge_rows.size:
        from .spgemm import spgemm as esc_spgemm

        # heavy-row submatrix: static structure from the plan, device data
        src = jnp.asarray(plan.huge_src)
        huge_csr = CSR(
            jnp.asarray(plan.huge_rp),
            jnp.take(a.col_ind, src),
            jnp.take(a.values, src),
            a.ncols,
        )
        huge_c = esc_spgemm(huge_csr, b, plan.huge_flops, plan.huge_flops)
        counts = counts.at[jnp.asarray(plan.huge_rows)].add(
            huge_c.row_counts(), mode="drop"
        )

    out_rp = jnp.concatenate(
        [jnp.zeros((1,), INDEX_DTYPE), jnp.cumsum(counts)]
    ).astype(INDEX_DTYPE)

    # gather-only assembly
    out_cap = plan.out_cap
    q = jnp.arange(out_cap, dtype=INDEX_DTYPE)
    row = (
        jnp.searchsorted(out_rp, q, side="right").astype(INDEX_DTYPE) - 1
    )
    safe_row = jnp.clip(row, 0, m - 1)
    pos = q - jnp.take(out_rp, safe_row)
    slot = jnp.take(jnp.asarray(plan.tile_slot), safe_row)
    bin_id = jnp.take(jnp.asarray(plan.bin_of_row), safe_row)
    ccol = jnp.full((out_cap,), ncols, INDEX_DTYPE)
    cval = jnp.zeros((out_cap,), QVALUE_DTYPE)
    for bi, (tb, (ucol, uval)) in enumerate(zip(plan.bins, results)):
        inb = (bin_id == bi) & (pos < tb.W) & (row < m)
        srow = jnp.where(inb, slot, 0)
        spos = jnp.where(inb, pos, 0)
        gcol = ucol[srow, spos]
        gval = uval[srow, spos]
        ccol = jnp.where(inb, gcol, ccol)
        cval = jnp.where(inb, gval, cval)
    if huge_c is not None:
        hrp = huge_c.row_ptr
        inh = (bin_id == -2) & (row < m)
        hstart = jnp.take(hrp, jnp.where(inh, slot, 0))
        hidx = jnp.clip(
            hstart + jnp.where(inh, pos, 0), 0, huge_c.capacity - 1
        )
        ccol = jnp.where(inh, jnp.take(huge_c.col_ind, hidx), ccol)
        cval = jnp.where(inh, jnp.take(huge_c.values, hidx), cval)
    valid = q < out_rp[-1]
    ccol = jnp.where(valid, ccol, ncols)
    cval = jnp.where(valid, cval, 0.0)
    return CSR(out_rp, ccol, cval, ncols)


def spgemm_tiles(
    a: CSR, b: CSR, plan: TilePlan | None = None, interpret: bool | None = None
) -> CSR:
    """C = A·B via the Pallas tile-ESC pipeline (ordered, duplicate-summed,
    semantics identical to ops.spgemm.spgemm)."""
    if plan is None:
        plan = plan_tiles(a, b)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _spgemm_tiles_impl(a, b, plan, interpret)
