"""ELL-ESC SpGEMM: the fast single-chip pipeline, built on the two data
movements this TPU does at full HBM speed.

Measured on v5e (tools/probe_tpu_caps*.py): element gathers/scatters run at
~100M elem/s, but **row gathers** (jnp.take axis=0 of 128-wide rows) and
**minor-axis sorts** run at memory bandwidth — three orders of magnitude
faster.  So this pipeline keeps every stage in 2-D row-tiled layouts and
never issues an element-granularity gather/scatter on the product stream:

1. **B re-layout**: B rows are padded to power-of-two widths and grouped
   into per-width ELL arrays (one small element-gather at nnz(B) scale).
2. **Expansion** (the flops-offset stream of mindex2-cuda/flops.cu:133):
   for each A entry, its B-row segment is one **row gather** from the ELL
   class array, scaled by the A value — products land in per-entry padded
   rows, then get re-chunked to a uniform CHUNK width.
3. **Row tiles**: each output row's products are assembled by one **row
   gather** of its entries' chunks (indices are static per sparsity
   structure — computed on host by the planner, like the reference's CPU
   classifier nGpuSpMM.cc:48-83).
4. **Sort–compress** (the ESC of tryOutCompute.cu / kernel.cu): one
   minor-axis `lax.sort` orders each row's products by column; duplicates
   are summed with a cumsum-difference (prefix sums at run ends, adjacent
   after compaction, so one shift-subtract yields run totals); a second
   minor-axis sort compacts survivors to the lane front.
5. **Assembly**: counts → row_ptr by cumsum; the flat CSR is produced by
   one packed int64 element-gather at nnz(C) scale (the only
   element-granularity op, unavoidable for the standard format).

Rows whose padded width exceeds the largest tile fall back to the global
ESC on their products (the 'olarge' escape, mindex2-cuda/\\:23-143).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import INDEX_DTYPE, QVALUE_DTYPE
from ..formats.csr import CSR
from ..utils.nphost import (
    concat_ranges,
    csr_host,
    fast_repeat,
    pow2ceil_arr,
    repeat_idx,
    segment_sums,
    snap_chunks_arr,
)
from .segments import exclusive_cumsum, repeat_segments


def _pow2ceil(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


# {2^k, 3·2^k} width snapping: segment widths only need to be MULTIPLES
# OF CHUNK (the gather granularity) — not powers of two (only the
# row-tile bitonic needs a pow2 width).  Allowing 3·2^k widths caps
# per-segment padding at 1.33x instead of 2x; the binding case is
# FEM-band B rows (cant.mtx class: 65 entries snapped 128 -> 96 at
# chunk=32), whose pow2 padding pushed every row past max_w and into
# the dense hub path.
_snap_chunks = snap_chunks_arr


CHUNK = 64  # chunk width: row-gather granularity (tuned: 64 beats 128 by ~17%)
# Largest row tile; beyond -> dense-MXU hub fallback.  The W=16384 and
# W=32768 classes COMPILE and run exactly on-chip (round-4: W=32768
# needs the raised scoped-VMEM limit in pallas_sort.py — 18.2 MB vs
# Mosaic's 16 MB default, v5e has 128 MB physical), but they are not
# the default: measured on-chip, sdc at W=32768 runs ~300 ns/lane (vs
# ~1-4 ns at production widths) and a bitonic row costs W·log²W lanes
# while the dense hub's per-row cost is width-independent — past ~8K
# the hub wins, so the default routing keeps it (round-4 probe logs,
# docs/ROOFLINE.md).  Callers studying the crossover pass max_w
# explicitly.  Anything wider than PALLAS_MAX_SORT_W would fall back
# to the XLA sort, which is CPU-only in practice (lax.sort +
# associative_scan at these widths never finished compiling on-chip).
MAX_W = 8192
PALLAS_MAX_SORT_W = 32768
AUTO_CHUNKS = (16, 32, 64, 128)  # auto-select candidate lattice


def auto_chunk(
    elen: np.ndarray,
    rp: np.ndarray,
    ncols: int,
    max_w: int,
    candidates: tuple = AUTO_CHUNKS,
) -> int:
    """Pick the tile chunk width from B's row-length distribution.

    The tile gathers are descriptor-bound (docs/ROOFLINE.md: ~110M row
    descriptors/s with bytes nearly free at these widths), so kernel
    time ~ number of chunk descriptors = padded tile volume / chunk.
    Rows whose padded width exceeds ``max_w`` take the dense-MXU hub
    path whose per-row cost is ~4 compaction/matmul passes over the
    full round128(ncols) dense row — charged as 4*ncp/128 descriptor
    equivalents.  Minimising this total over the candidate lattice is
    the data-adaptive classifier role of the reference
    (mindex2-cuda/flops.cu:131-140, nGpuSpMM.cc:48-83): the defaults
    previously misrouted banded 65-entry-row matrices (cant.mtx class)
    entirely to hub at chunk=64 (VERDICT r3 Missing #3).

    Ties within 2% prefer the larger chunk (fewer descriptors per byte
    moved and a shallower bitonic start).
    """
    ncp = -(-int(ncols) // 128) * 128
    hub_desc = 4.0 * ncp / 128.0  # densify/compact traffic per hub row
    # hub matmul term: the dense path contracts [hub, kh] x [kh, ncp]
    # (kh = union of B rows the hub touches), so per-row cost also
    # carries 2*kh*ncp flops; 1 descriptor ~ 180k MXU flops (110M
    # descriptors/s vs ~20 TF/s f32).  Without this term banded
    # matrices scored all-hub as "cheap" — the round-2 33 GB OOM shape.
    mxu_flops_per_desc = 180_000.0
    best_c, best_j = candidates[0], float("inf")
    scores = {}
    # per-entry padded widths via a value table over the (small) set of
    # possible B-row lengths: one nnz-scale gather per candidate instead
    # of nnz-scale snap/pow2 arithmetic
    maxlen = int(elen.max()) if elen.size else 0
    lens = np.arange(maxlen + 1, dtype=np.int64)
    elen32 = elen.astype(np.int32, copy=False)
    for c in candidates:
        tbl = snap_chunks_arr(-(-lens // c)) * c
        tbl[0] = 0
        epw = tbl[elen32]
        prow = segment_sums(epw, rp)
        wr_p2 = pow2ceil_arr(np.maximum(prow, c))
        nonempty = prow > 0
        hub = nonempty & (wr_p2 > max_w)
        binned = nonempty & ~hub
        wb = wr_p2[binned]
        # descriptor term (gather) + bitonic lane-op term: the presorted
        # bitonic runs merge levels log2(2c)+1 .. log2(W), level k costs
        # ~k passes over W lanes, so lane-ops ~ W*(L^2 - L0^2)/2 with
        # L = log2(W), L0 = log2(2c).  The relative weight (1 lane-op ~
        # descriptor/585) is calibrated from two measured cant-class TPU
        # points: chunk=32/W=8192 -> 8.1 us/row, chunk=128/W=16384 ->
        # 15.2 us/row (benchmarks/results_r3.jsonl, results_r4.jsonl) —
        # without this term the model mispicked 128 and lost 1.9x.
        lw = np.log2(np.maximum(wb, 1)).astype(np.float64)
        l0 = float(np.log2(2 * c))
        lane_ops = wb * np.maximum(lw * lw - l0 * l0, 0.0) / 2.0
        kh_est = min(float(ncols), float(prow[hub].sum()))
        hub_row_cost = hub_desc + 2.0 * kh_est * ncp / mxu_flops_per_desc
        j = (
            float(wb.sum()) / c
            + float(lane_ops.sum()) / 585.0
            + hub_row_cost * int(hub.sum())
        )
        scores[c] = j
        if j < best_j:
            best_c, best_j = c, j
    for c in sorted(candidates, reverse=True):
        if scores[c] <= best_j * 1.02:
            return c
    return best_c


@dataclasses.dataclass(frozen=True, eq=False)
class EllPlan:
    """Static per-structure plan (identity-hashed jit static arg)."""

    # B re-layout: one ELL array per segment-width class
    b_classes: tuple  # tuple[(S, np.int32[rows_S] b_row_ids)]
    # chunk base of each class segment region in the global chunk array
    class_chunk_base: tuple  # int per class
    total_chunks: int  # incl. 1 sentinel chunk at index total_chunks-1
    # row tiles: per width-class bin
    bins: tuple  # tuple[(W, np.int32[R_b] row_ids, np.int32[R_b*W/CHUNK] tile_src)]
    huge_rows: np.ndarray
    huge_rp: np.ndarray
    huge_src: np.ndarray
    huge_flops: int
    # assembly
    rows: int
    ncols: int
    out_cap: int
    row_bin: np.ndarray  # int32[rows]: bin id, -1 none, -2 huge
    row_slot: np.ndarray  # int32[rows]: slot in its bin / huge list
    chunk: int = 128  # row-gather granularity this plan was built with
    # hub B-densify layout (host-side: B's structure is static, so the
    # scatter coordinates are plan constants; entries are pre-partitioned
    # by column slab so total scatter count stays nnz(B) regardless of
    # slab count).  None when there are no huge rows.
    hub_slab: int = 0
    hub_eorder: np.ndarray | None = None  # int32[bnnz] entry ids, slab-major
    hub_lin: np.ndarray | None = None  # int32[bnnz] row*slab+local_col
    hub_sptr: np.ndarray | None = None  # int64[n_slabs+1] entry offsets
    # dense contraction space restricted to the B rows hub rows touch
    hub_kmap: np.ndarray | None = None  # int32[b.rows]: global -> local, -1
    hub_kh: int = 0  # padded union size (multiple of 128)
    # per-hub-row flat-region bound: min(row flops, ncols) rounded to 128
    huge_caps: np.ndarray | None = None  # int32[H]

    __hash__ = object.__hash__


def _qpad8(n: int) -> int:
    """Quantised padding: next power of two, min 8 — keeps bin shapes in a
    small set so re-planning across R-MCL iterations hits the jit cache."""
    return max(8, _pow2ceil(n))


def plan_ell(
    a: CSR,
    b: CSR,
    chunk: int | None = None,
    max_w: int = MAX_W,
    quantize: bool = False,
) -> EllPlan:
    rp, acol_all = csr_host(a)
    nnz = int(rp[-1])
    acol = acol_all[:nnz]
    brp, _ = csr_host(b)
    bcounts = np.diff(brp)
    m = a.rows

    safe = np.clip(acol, 0, b.rows - 1)
    elen = bcounts[safe]
    if chunk is None:
        # data-adaptive chunk from B's row-length distribution (the
        # reference classifies per run, flops.cu:131-140)
        chunk = auto_chunk(elen, rp, b.ncols, max_w)
    # per-entry padded width (0 for empty segments — they emit nothing):
    # the B segment's class width, a {2^k, 3*2^k} multiple of chunk —
    # via a value table over possible B-row lengths (one gather at nnz
    # scale instead of nnz-scale snap arithmetic)
    _lens = np.arange(int(elen.max()) + 1 if elen.size else 1, dtype=np.int64)
    _wtbl = snap_chunks_arr(-(-_lens // chunk)) * chunk
    _wtbl[0] = 0
    epw = _wtbl[elen.astype(np.int32, copy=False)]
    prow_w = segment_sums(epw, rp)  # padded row width
    rf = segment_sums(elen, rp)

    # ---- B classes ------------------------------------------------------
    bpw = np.where(
        bcounts > 0, snap_chunks_arr(-(-bcounts // chunk)) * chunk, 0
    )
    b_classes = []
    b_class_of_row = np.full(b.rows, -1, np.int32)
    b_slot_of_row = np.zeros(b.rows, np.int32)
    for s in np.unique(bpw[bpw > 0]):
        sel = np.nonzero(bpw == s)[0]
        b_class_of_row[sel] = len(b_classes)
        b_slot_of_row[sel] = np.arange(sel.size, dtype=np.int32)
        if quantize:
            pad = _qpad8(sel.size) - sel.size
            sel = np.concatenate([sel, np.full(pad, -1, sel.dtype)])
        b_classes.append((int(s), sel.astype(np.int32)))

    # ---- chunk layout over the B-ELL class arrays -----------------------
    # tile gathers read B-ELL chunks DIRECTLY (values scaled by the A value
    # per chunk afterwards) — no intermediate per-entry product copy.
    class_chunk_base = []
    chunk_base = 0
    for ci, (S, b_rows) in enumerate(b_classes):
        class_chunk_base.append(chunk_base)
        cpe = S // chunk
        # each class array carries len(b_rows) rows + 1 sentinel row
        chunk_base += (b_rows.shape[0] + 1) * cpe
    total_chunks = chunk_base
    # global pad chunk: the sentinel row of the first class (all-sentinel)
    if b_classes:
        S0, rows0 = b_classes[0]
        sentinel_chunk = class_chunk_base[0] + rows0.shape[0] * (S0 // chunk)
    else:
        sentinel_chunk = 0
    # first B-ELL chunk of each A entry (vectorised over classes: the
    # class id indexes small per-class tables — no per-class nnz pass)
    act = elen > 0
    cls = b_class_of_row[safe]
    cls0 = np.maximum(cls, 0)
    ccb_tab = np.zeros(max(len(b_classes), 1), dtype=np.int64)
    cpe_tab = np.zeros(max(len(b_classes), 1), dtype=np.int64)
    for ci, (S, _) in enumerate(b_classes):
        ccb_tab[ci] = class_chunk_base[ci]
        cpe_tab[ci] = S // chunk
    ent_cpe = np.where(act, cpe_tab[cls0], 0)
    ent_chunk_start = np.where(
        act,
        ccb_tab[cls0] + b_slot_of_row[safe].astype(np.int64) * ent_cpe,
        0,
    )

    # ---- row tile bins (vectorised tile_src construction) ---------------
    wr = np.where(prow_w > 0, np.maximum(chunk, prow_w), 0)
    wr_p2 = np.where(wr > 0, pow2ceil_arr(wr), 0)
    bins = []
    row_bin = np.full(m, -1, np.int32)
    row_slot = np.zeros(m, np.int32)
    # all chunk-scale arithmetic in int32: chunk ids are bounded by the
    # B-ELL chunk count and tile positions by the padded tile volume,
    # both far below 2^31 for any single-chip-feasible plan (guarded)
    if total_chunks >= 2**31:
        raise ValueError(
            f"B-ELL layout needs {total_chunks} chunks (>= 2^31); "
            "partition the multiply (ops/partitioned.py) instead"
        )
    ecs32 = ent_chunk_start.astype(np.int32, copy=False)
    ne_all = (epw // chunk).astype(np.int32, copy=False)  # chunks/entry
    w = chunk
    while w <= max_w:
        sel = np.nonzero(wr_p2 == w)[0]
        if sel.size:
            bi = len(bins)
            row_bin[sel] = bi
            row_slot[sel] = np.arange(sel.size, dtype=np.int32)
            cpr = w // chunk
            rpad = _qpad8(sel.size) if quantize else sel.size
            # entries belonging to the bin's rows (row-major order is
            # exactly the concatenation of the rows' entry ranges)
            e_sel = concat_ranges(rp[sel], rp[sel + 1], dtype=np.int32)
            ne = ne_all[e_sel]
            cs = np.cumsum(ne, dtype=np.int64)
            tot = int(cs[-1]) if ne.size else 0
            if tot >= 2**31:
                raise ValueError(
                    f"bin w={w} needs {tot} tile chunks (>= 2^31); "
                    "partition the multiply (ops/partitioned.py) instead"
                )
            rep = repeat_idx(ne, tot)  # chunk -> local entry index
            ne_excl = (cs - ne).astype(np.int32, copy=False)
            within = np.arange(tot, dtype=np.int32)
            within -= ne_excl[rep]
            src_vals = ecs32[e_sel][rep] + within
            # the bin's rows fill [rpad, cpr] row-major with each row's
            # chunks left-packed: a boolean-mask assignment consumes
            # src_vals in exactly that order — no dest-index pass
            nch_row = (prow_w[sel] // chunk).astype(np.int32)
            mask = np.arange(cpr, dtype=np.int32)[None, :] < nch_row[:, None]
            tile_src = np.full((rpad, cpr), sentinel_chunk, dtype=np.int32)
            tile_src[: sel.size][mask] = src_vals
            tile_ent = np.zeros((rpad, cpr), dtype=np.int32)
            tile_ent[: sel.size][mask] = e_sel[rep]
            sel_p = (
                np.concatenate(
                    [sel, np.full(rpad - sel.size, -1, sel.dtype)]
                )
                if rpad > sel.size
                else sel
            )
            bins.append(
                (
                    int(w),
                    sel_p.astype(np.int32),
                    tile_src.reshape(-1),
                    tile_ent.reshape(-1),
                )
            )
        w *= 2
    huge = np.nonzero(wr_p2 > max_w)[0].astype(np.int32)
    row_bin[huge] = -2
    row_slot[huge] = np.arange(huge.size, dtype=np.int32)
    hlens = (rp[huge + 1] - rp[huge]) if huge.size else np.zeros(0, np.int64)
    huge_rp = np.zeros(huge.size + 1, dtype=np.int64)
    np.cumsum(hlens, out=huge_rp[1:])
    huge_src = (
        concat_ranges(rp[huge], rp[huge + 1], dtype=np.int32)
        if huge.size
        else np.zeros(0, np.int32)
    )
    huge_flops = max(int(rf[huge].sum()), 1) if huge.size else 1
    huge_caps = (
        (-(-np.minimum(rf[huge], b.ncols) // 128) * 128)
        .clip(min=128)
        .astype(np.int32)
        if huge.size
        else None
    )

    # hub B-densify layout: pick the column-slab width from an HBM budget,
    # then pre-partition B's entries by slab ON HOST (structure is static).
    # Each slab's scatter then touches only its own entries — the old
    # per-slab full-capacity scatter paid nnz(B) descriptors PER SLAB
    # (measured ~5-6.5 ms at s14; tools/probe_bdense.py).
    # The dense contraction space is RESTRICTED to the union of B rows the
    # hub rows actually reference (kh of K): the densify's cost is pure
    # dense-array traffic (probe_bdense2 — the scatter itself is ~free),
    # so it scales with kh/K (≈0.49 at s14).
    hub_slab, hub_eorder, hub_lin, hub_sptr = 0, None, None, None
    hub_kmap, hub_kh = None, 0
    if huge.size:
        K, N = b.rows, b.ncols
        hub_krows = np.unique(safe[huge_src])
        kh = int(hub_krows.size)
        khp = max(128, -(-kh // 128) * 128)  # MXU contraction alignment
        kmap = np.full(K, -1, np.int32)
        kmap[hub_krows] = np.arange(kh, dtype=np.int32)
        # 512 MB slab cap: the TPU scatter rate falls off a cliff past
        # ~0.5 GB dense targets (probe_bdense2: 1 GB = 13.2 ms but
        # 0.5 GB = 2.7 ms — 5x better at 2x smaller)
        budget = int(os.environ.get("SMF_HUB_SLAB_BYTES", str(1 << 29)))
        slab = N
        while khp * slab * 4 > budget and slab > 256:
            slab = -(-slab // 2)
        n_slabs = -(-N // slab)
        bnnz = int(brp[-1])
        bcol = csr_host(b)[1][:bnnz].astype(np.int64)
        berow = repeat_idx(bcounts, bnnz)
        sel = np.nonzero(kmap[berow] >= 0)[0]
        bcol, berow = bcol[sel], berow[sel]
        sl_id = bcol // slab
        order = np.argsort(sl_id, kind="stable")
        lin = (
            kmap[berow[order]].astype(np.int64) * slab
            + (bcol[order] - sl_id[order] * slab)
        )
        hub_sptr = np.searchsorted(
            sl_id[order], np.arange(n_slabs + 1)
        ).astype(np.int64)
        hub_slab = int(slab)
        hub_eorder = sel[order].astype(np.int32)
        hub_lin = lin.astype(np.int32)  # khp*slab <= budget/4 < 2^31
        hub_kmap = kmap
        hub_kh = khp

    out_cap = int(np.minimum(rf, b.ncols).sum())
    return EllPlan(
        b_classes=tuple(b_classes),
        class_chunk_base=tuple(class_chunk_base),
        total_chunks=total_chunks,
        bins=tuple(bins),
        huge_rows=huge,
        huge_rp=huge_rp.astype(np.int32),
        huge_src=huge_src,
        huge_flops=huge_flops,
        hub_slab=hub_slab,
        hub_eorder=hub_eorder,
        hub_lin=hub_lin,
        hub_sptr=hub_sptr,
        hub_kmap=hub_kmap,
        hub_kh=hub_kh,
        huge_caps=huge_caps,
        rows=m,
        ncols=b.ncols,
        out_cap=max(out_cap, 1),
        row_bin=row_bin,
        row_slot=row_slot,
        chunk=int(chunk),
    )


# ---------------------------------------------------------------------------
# windowed pair gathers
#
# Gathers on this chip are descriptor-bound (docs/ROOFLINE.md: ~110M
# descriptors/s x bytes-per-descriptor), so every unaligned ragged read is
# phrased as "gather two WQ-wide rows per window and roll" — and cols+vals
# are interleaved into ONE window-source array ([T/WQ, 2*WQ]: col lanes
# then value-bit lanes) so each window costs 2 descriptors instead of 4.
# ---------------------------------------------------------------------------
_WQ = 16  # window width (elements); flat tile layouts are 16-aligned


def _win_src_pairs(cols, valbits, wq: int):
    """[T] int32 cols + [T] int32 value bits -> [T/wq, 2*wq] interleaved
    window-source rows (cols in lanes [0,wq), value bits in [wq,2*wq))."""
    return jnp.concatenate(
        [cols.reshape(-1, wq), valbits.reshape(-1, wq)], axis=1
    )


def _window_gather_pairs(src, p0, wq: int):
    """Unaligned wq-wide (col,val) windows starting at flat positions
    ``p0`` out of a `_win_src_pairs` array: one row-pair gather + a
    wq-way roll-select.  Returns ([Q, wq] int32 cols, [Q, wq] f32 vals)."""
    nw = src.shape[0]
    wr = jnp.clip(p0 // wq, 0, nw - 2)
    off = jnp.clip(p0 - wr * wq, 0, wq - 1)[:, None]
    g = jnp.concatenate(
        [jnp.take(src, wr, axis=0), jnp.take(src, wr + 1, axis=0)], axis=1
    )  # [Q, 4*wq]
    gc = jnp.concatenate([g[:, :wq], g[:, 2 * wq : 3 * wq]], axis=1)
    gv = jnp.concatenate([g[:, wq : 2 * wq], g[:, 3 * wq :]], axis=1)
    accc, accv = gc[:, :wq], gv[:, :wq]
    for o in range(1, wq):
        sel = off == o
        accc = jnp.where(sel, gc[:, o : o + wq], accc)
        accv = jnp.where(sel, gv[:, o : o + wq], accv)
    return accc, jax.lax.bitcast_convert_type(accv, jnp.float32)


# ---------------------------------------------------------------------------
# jitted pipeline (two phases: tiles+counts, then exact-size assembly)
# ---------------------------------------------------------------------------
def _flat_layout(plan: EllPlan):
    """Host-side flat region layout of all compacted tiles + the huge-row
    stream (memoised on the plan object itself)."""
    lay = getattr(plan, "_layout_cache", None)
    if lay is not None:
        return lay
    base = 0
    bin_starts = []
    flat_base = np.zeros(plan.rows, dtype=np.int64)
    for W, row_ids, _, _e in plan.bins:
        bin_starts.append(base)
        valid = row_ids >= 0
        flat_base[row_ids[valid]] = (
            base + np.arange(row_ids.size, dtype=np.int64)[valid] * W
        )
        base += row_ids.size * W
    huge_start = base
    # huge rows go through the dense-MXU path; each row's compacted flat
    # region is bounded by min(row flops, ncols) rounded to 128 (128-
    # aligned flat_base keeps the row-granular assembly repair aligned).
    # A full ncp-wide region per row was ~4.6x padding at s16
    # (docs/ROUND3_NOTES.md §4e).
    if plan.huge_rows.size:
        caps = plan.huge_caps.astype(np.int64)
        flat_base[plan.huge_rows] = huge_start + np.concatenate(
            [np.zeros(1, np.int64), np.cumsum(caps)[:-1]]
        )
        base += int(caps.sum())
    lay = {
        "bin_starts": tuple(bin_starts),
        "flat_base": flat_base,
        "huge_start": huge_start,
        "flat_total": base,
    }
    object.__setattr__(plan, "_layout_cache", lay)
    return lay


@partial(
    jax.jit,
    static_argnames=("plan", "chunk", "use_pallas", "fused_out_cap", "_stage"),
)
def _tiles_impl(
    a: CSR,
    b: CSR,
    plan: EllPlan,
    chunk: int,
    use_pallas: bool = False,
    fused_out_cap: int | None = None,
    _stage: int = 99,
):
    """Phase 1: expansion + per-bin sort/dedup/compaction.

    Returns (flat cols [T] int32, flat vals [T] f32, counts [m],
    flat_base [m] incl. huge rows).

    ``_stage`` truncates the pipeline for slope-profiling (tools/
    profile_fused.py): 0 = B-ELL build only, 1 = + tile chunk gathers,
    2 = + sort/dedup/compact, 99 = full.
    """
    m, ncols = plan.rows, plan.ncols
    lay = _flat_layout(plan)

    # 1. B ELL classes.  Windowed build when the layout is 16-aligned:
    # 2 row descriptors per 16-element window instead of 16 element
    # descriptors per plane (measured 9.4 -> ~1 ms at s14).
    win_ok = chunk % _WQ == 0
    if win_ok:
        cap = int(b.capacity)
        tb = -(-cap // _WQ) * _WQ + 2 * _WQ
        bc = jnp.concatenate(
            [b.col_ind, jnp.full((tb - cap,), ncols, INDEX_DTYPE)]
        )
        bvb = jnp.concatenate(
            [
                jax.lax.bitcast_convert_type(b.values, jnp.int32),
                jnp.zeros((tb - cap,), jnp.int32),
            ]
        )
        bsrc = _win_src_pairs(bc, bvb, _WQ)
    b_ells = []
    for S, b_rows in plan.b_classes:
        rows_s = jnp.asarray(b_rows)
        ok = (rows_s >= 0)[:, None]
        safe_rows = jnp.clip(rows_s, 0, b.rows - 1)
        start = jnp.take(b.row_ptr, safe_rows)[:, None]
        cnt = jnp.where(
            ok, (jnp.take(b.row_ptr, safe_rows + 1)[:, None] - start), 0
        )
        lanes = jnp.arange(S, dtype=INDEX_DTYPE)[None, :]
        valid = lanes < cnt
        if win_ok:
            j = jnp.arange(S // _WQ, dtype=INDEX_DTYPE)[None, :] * _WQ
            p0 = (start + j).reshape(-1)
            wc, wv = _window_gather_pairs(bsrc, p0, _WQ)
            ec0 = wc.reshape(rows_s.shape[0], S)
            ev0 = wv.reshape(rows_s.shape[0], S)
        else:
            idx = jnp.clip(start + lanes, 0, b.capacity - 1)
            ec0 = jnp.take(b.col_ind, idx)
            ev0 = jnp.take(b.values, idx)
        ec = jnp.where(valid, ec0, ncols)
        ev = jnp.where(valid, ev0, 0.0)
        # one sentinel row at the end: target of padded entry slots
        ec = jnp.concatenate(
            [ec, jnp.full((1, S), ncols, INDEX_DTYPE)], axis=0
        )
        ev = jnp.concatenate([ev, jnp.zeros((1, S), QVALUE_DTYPE)], axis=0)
        b_ells.append((ec.astype(INDEX_DTYPE), ev.astype(QVALUE_DTYPE)))

    # 2. chunk view of the B-ELL classes (tile gathers read these
    # directly; values are scaled by the owning A entry's value per chunk).
    # Cols and value bits interleave into ONE (nchunks, 2*chunk) array so
    # each tile chunk costs one row descriptor instead of two — gathers
    # are descriptor-bound (docs/ROOFLINE.md).
    if b_ells:
        prod = jnp.concatenate(
            [
                jnp.concatenate(
                    [
                        ec.reshape(-1, chunk),
                        jax.lax.bitcast_convert_type(
                            ev, jnp.int32
                        ).reshape(-1, chunk),
                    ],
                    axis=1,
                )
                for ec, ev in b_ells
            ],
            axis=0,
        )
    else:
        prod = jnp.concatenate(
            [
                jnp.full((1, chunk), ncols, INDEX_DTYPE),
                jnp.zeros((1, chunk), jnp.int32),
            ],
            axis=1,
        )
    if _stage == 0:
        return (prod,)

    # 3-4. per-bin row tiles: gather chunks, scale, sort, dedup, compact
    counts = jnp.zeros((m,), INDEX_DTYPE)
    cols_parts, vals_parts = [], []
    for bi, (W, row_ids, tile_src, tile_ent) in enumerate(plan.bins):
        src = jnp.asarray(tile_src)
        aval = jnp.take(a.values, jnp.asarray(tile_ent))[:, None]
        t = jnp.take(prod, src, axis=0)  # one row gather for cols+vals
        tc = t[:, :chunk].reshape(-1, W)
        tv = (
            jax.lax.bitcast_convert_type(t[:, chunk:], QVALUE_DTYPE) * aval
        ).reshape(-1, W)
        if _stage == 1:
            cols_parts.append(tc.reshape(-1))
            vals_parts.append(tv.reshape(-1))
            continue
        if use_pallas and W <= PALLAS_MAX_SORT_W:
            from .pallas_sort import sort_dedup_compact

            # every aligned chunk is a column-sorted B-row slice (sentinel
            # pads at the tail keep it sorted); reversing odd chunks sets
            # up the alternating-run invariant so the bitonic starts at
            # k=2*chunk instead of k=2 — the W==chunk bin skips the
            # network entirely
            nch = W // chunk
            if nch > 1:
                flip = (jnp.arange(nch) & 1).astype(bool)[None, :, None]
                t3 = tc.reshape(-1, nch, chunk)
                tc = jnp.where(flip, t3[:, :, ::-1], t3).reshape(-1, W)
                v3 = tv.reshape(-1, nch, chunk)
                tv = jnp.where(flip, v3[:, :, ::-1], v3).reshape(-1, W)
            # rows/step stays 8: Mosaic's vector_extract_strided_slice
            # aborts on this kernel's packed row-slices for any taller
            # block (array.h limits check, measured at rps 64/256,
            # 2026-08-19) — unlike align_windows, which runs at 64.  The
            # narrow bins' per-step DMA overhead is minor (~1 ms total).
            rpadded = -(-tc.shape[0] // 8) * 8
            if rpadded != tc.shape[0]:
                padr = rpadded - tc.shape[0]
                tc = jnp.concatenate(
                    [tc, jnp.full((padr, W), ncols, INDEX_DTYPE)], axis=0
                )
                tv = jnp.concatenate([tv, jnp.zeros((padr, W))], axis=0)
            key2, uval = sort_dedup_compact(tc, tv, ncols, presorted=chunk)
            key2 = key2[: len(tile_src) // (W // chunk)]
            uval = uval[: key2.shape[0]]
        else:
            tc, tv = jax.lax.sort((tc, tv), dimension=1, num_keys=1)
            # segmented within-run sums (NOT a cumsum difference: the
            # cancellation of two ~row-total prefixes costs ~1e-4 abs
            # error on wide bins; run-local sums keep error ~eps*runlen)
            first = jnp.concatenate(
                [
                    jnp.ones((tc.shape[0], 1), bool),
                    tc[:, 1:] != tc[:, :-1],
                ],
                axis=1,
            )

            def _seg(x, y):
                sx, vx = x
                sy, vy = y
                return sx | sy, jnp.where(sy, vy, vx + vy)

            _, runsum = jax.lax.associative_scan(_seg, (first, tv), axis=1)
            nxt = jnp.concatenate(
                [tc[:, 1:], jnp.full((tc.shape[0], 1), ncols, INDEX_DTYPE)],
                axis=1,
            )
            is_last = (tc != nxt) & (tc < ncols)
            key2 = jnp.where(is_last, tc, ncols)
            key2, uval = jax.lax.sort((key2, runsum), dimension=1, num_keys=1)
            uval = jnp.where(key2 < ncols, uval, 0.0)
        cnt = jnp.sum(key2 < ncols, axis=1).astype(INDEX_DTYPE)
        rid = jnp.asarray(row_ids)
        counts = counts.at[jnp.where(rid >= 0, rid, m)].set(
            cnt, mode="drop"
        )
        cols_parts.append(key2.reshape(-1))
        vals_parts.append(uval.reshape(-1))
    if _stage in (1, 2):
        # profiling cutoff: checksum per part (skips hub + assembly)
        return (
            tuple(jnp.sum(p.astype(jnp.float32)) for p in cols_parts),
            tuple(jnp.sum(p) for p in vals_parts),
        )

    flat_base = jnp.asarray(lay["flat_base"].astype(np.int32))
    # Heavy rows (flops of order ncols or more) go DENSE on the MXU: the
    # reference's dense-accumulator idea (cpu_csr_kernel.h thread_data /
    # DenseMatrix) reborn — scatter A_huge and B to dense, one big matmul
    # (flops are nearly free on the MXU), then one minor-axis sort compacts
    # each dense row back to sparse.
    if plan.huge_rows.size:
        H = plan.huge_rows.size
        K, N = b.rows, ncols
        # B densified over the hub-visible B-row UNION (kh of K rows —
        # the densify is dense-array-traffic bound, probe_bdense2) in
        # column slabs (width picked at plan time from an HBM budget —
        # bounds peak memory at scale 16 and stays under the ~0.5 GB
        # scatter cliff).  The scatter coordinates are HOST constants
        # (B's structure is static in the plan) pre-partitioned by slab,
        # so densify costs exactly nnz(B∩union) scatter descriptors
        # total, not nnz(B) x n_slabs.
        slab = plan.hub_slab
        khp = plan.hub_kh
        kmap = jnp.asarray(plan.hub_kmap)
        n_slabs = -(-N // slab)
        # opt-in bf16 MXU inputs for the hub matmul (4x MXU rate on
        # v5e; accumulation stays f32 via preferred_element_type).
        # Read at trace time — a bench knob, not a per-call switch.
        hub_bf16 = os.environ.get("SMF_HUB_BF16", "0") == "1"
        mxu_dt = jnp.bfloat16 if hub_bf16 else QVALUE_DTYPE

        def _b_slab(sl):
            e0, e1 = int(plan.hub_sptr[sl]), int(plan.hub_sptr[sl + 1])
            lin = jnp.asarray(plan.hub_lin[e0:e1])
            vals = jnp.take(b.values, jnp.asarray(plan.hub_eorder[e0:e1]))
            return (
                jnp.zeros((khp * slab,), mxu_dt)
                .at[lin]
                .set(
                    vals.astype(mxu_dt),
                    mode="promise_in_bounds",
                    unique_indices=True,
                )
                .reshape(khp, slab)
            )

        # NOTE: densification cannot represent explicit zeros, so products
        # that cancel to exactly 0.0 are dropped for huge rows (raw-equal
        # semantics; the tile path keeps them).
        HC = 1024 if H > 1024 else H  # huge-row chunk
        ncp = -(-N // 128) * 128  # dense-row compaction width
        hlens = np.diff(plan.huge_rp)
        a_ds = []
        for h0 in range(0, H, HC):
            h1 = min(h0 + HC, H)
            hc = h1 - h0
            hcp = -(-hc // 8) * 8  # Pallas sublane granularity
            e0, e1 = int(plan.huge_rp[h0]), int(plan.huge_rp[h1])
            src = jnp.asarray(plan.huge_src[e0:e1])
            rows_rep = jnp.asarray(
                np.repeat(
                    np.arange(hc, dtype=np.int32), hlens[h0:h1]
                )
            )
            # hub entry columns are in the union by construction
            kcol = jnp.take(
                kmap, jnp.clip(jnp.take(a.col_ind, src), 0, K - 1)
            )
            a_d = jnp.zeros((hcp, khp), QVALUE_DTYPE)
            a_d = a_d.at[
                rows_rep, jnp.clip(kcol, 0, khp - 1)
            ].add(jnp.take(a.values, src))
            a_ds.append((hc, hcp, a_d.astype(mxu_dt)))
        # slab-OUTER matmul loop: each slab is built, consumed by every
        # row chunk, then dead — XLA frees it, so peak HBM holds one
        # slab + the (H, N) results, never the K x N dense B.
        parts = [[] for _ in a_ds]
        stage3 = []
        for sl in range(n_slabs):
            bd = _b_slab(sl)
            if _stage == 3:  # profiling cutoff: B densify only
                stage3.append(jnp.sum(bd))
                continue
            for pi, (_hc, _hcp, a_d) in enumerate(a_ds):
                parts[pi].append(
                    jnp.dot(
                        a_d,
                        bd.astype(mxu_dt),
                        preferred_element_type=jnp.float32,
                    )
                )
        if _stage == 3:
            return tuple(stage3)
        hcounts = []
        for pi, (hc, hcp, _a_d) in enumerate(a_ds):
            c_d = (
                jnp.concatenate(parts[pi], axis=1)[:, :N]
                if n_slabs > 1
                else parts[pi][0][:, :N]
            )
            if _stage == 4:  # profiling cutoff: + A densify + matmul
                # sum(c_d^2): a plain sum lets XLA factor sum(A@B) into
                # sum-of-row-sums and skip the matmul entirely
                hcounts.append(jnp.sum(c_d * c_d))
                continue
            if ncp > N:
                c_d = jnp.concatenate(
                    [c_d, jnp.zeros((hcp, ncp - N), QVALUE_DTYPE)], axis=1
                )
            # dense rows are already column-ordered: compaction needs no
            # sort — the log-width shift compaction runs in VMEM
            # (pallas_sort.compact_nonzero_rows, ~0.0 ms at s14 shapes by
            # slope timing).  A two-level 128-block-compact + scatter-add
            # stitch was tried and REJECTED: the stitch's row scatters
            # cost ~13.6 ms alone (tools/probe_hub.py) — scatters are the
            # off-law primitive on this chip.  XLA lane-sort fallback for
            # widths past the VMEM-block budget.
            from .pallas_sort import compact_nonzero_rows

            # scoped-VMEM budget: the kernel's log-shift temps need
            # ~13 MB at width 32768 and ~26 MB at 65536 — past Mosaic's
            # 16 MB default, so compact_nonzero_rows raises its scoped
            # limit for wide rows (96 MB vs 128 MB physical; the XLA
            # lane-sort fallback it replaces measured 550 ms of the
            # 786 ms s16 kernel, tools/profile_fused.py round 4).  Width
            # 131072 (s17) compiles and validates on-chip too (~52 MB
            # scoped; round-4 probe); past that, the fallback.
            if ncp <= 131072:
                key, vals = compact_nonzero_rows(
                    c_d, N, interpret=jax.default_backend() != "tpu"
                )
            else:
                lanes = jax.lax.broadcasted_iota(
                    INDEX_DTYPE, (hcp, ncp), 1
                )
                key = jnp.where((c_d != 0) & (lanes < N), lanes, ncp)
                key, vals = jax.lax.sort(
                    (key, c_d), dimension=1, num_keys=1
                )
                key = jnp.where(key < N, key, N)
            hcounts.append(
                jnp.sum(key[:hc] < N, axis=1).astype(INDEX_DTYPE)
            )
            # pack the compacted rows to their per-row flat caps
            # (min(flops, ncols) rounded to 128 — the full-ncp stride was
            # ~4.6x padding at s16): one 128-granular row gather with
            # host-planned window sources
            caps_np = plan.huge_caps[pi * HC : pi * HC + hc].astype(np.int64)
            nw_row = ncp // 128
            src_win = np.concatenate(
                [
                    np.arange(cw // 128, dtype=np.int64) + i * nw_row
                    for i, cw in enumerate(caps_np)
                ]
            )
            swin = jnp.asarray(src_win)
            cols_parts.append(
                jnp.take(key[:hc].reshape(-1, 128), swin, axis=0).reshape(-1)
            )
            vals_parts.append(
                jnp.take(vals[:hc].reshape(-1, 128), swin, axis=0).reshape(-1)
            )
        if _stage == 4:
            return tuple(hcounts)
        if _stage == 5:  # profiling cutoff: + hub compaction (no concat)
            return (
                tuple(jnp.sum(p.astype(jnp.float32)) for p in cols_parts),
                tuple(jnp.sum(p) for p in vals_parts),
                tuple(jnp.sum(h) for h in hcounts),
            )
        counts = counts.at[jnp.asarray(plan.huge_rows)].set(
            jnp.concatenate(hcounts), mode="drop"
        )
    elif _stage in (3, 4, 5):
        # hub-free plan: the hub cutoffs measure nothing extra — return
        # the stage checksum here so a '+hub' label never silently times
        # the full tiles path (ADVICE r2 #2)
        return (
            tuple(jnp.sum(p.astype(jnp.float32)) for p in cols_parts),
            tuple(jnp.sum(p) for p in vals_parts),
            (),
        )
    flat_c = (
        jnp.concatenate(cols_parts)
        if cols_parts
        else jnp.zeros((1,), jnp.int32)
    )
    flat_v = (
        jnp.concatenate(vals_parts)
        if vals_parts
        else jnp.zeros((1,), jnp.float32)
    )
    if fused_out_cap is not None:
        # single-dispatch mode: assembly fused into the same executable
        # (the tunnel adds ~40ms launch latency per dispatch).  nnz(C) is
        # returned alongside: the huge-row dense path makes counts
        # value-dependent, so the cached cap must be re-validated.
        # Materialization fence at the phase handoff: without it XLA
        # fuses the tile-phase concats into the assembly's consumers
        # (the window-source lesson, _assemble_body).
        flat_c, flat_v = jax.lax.optimization_barrier((flat_c, flat_v))
        csr = _assemble_body(
            flat_c, flat_v, counts, flat_base, ncols, fused_out_cap,
            use_pallas,
        )
        return csr, jnp.sum(counts)
    return flat_c, flat_v, counts, flat_base


_WA = 128  # assembly window width (one full lane row)


def _roll_sel(x, off, width: int, right: bool = False):
    """Per-row dynamic lane roll of ``x`` [Q, L] by ``off`` [Q] (< width),
    in log2(width) conditional full-lane rolls."""
    sign = 1 if right else -1
    bit = 1
    while bit < width:
        sel = (off & bit) != 0
        x = jnp.where(sel[:, None], jnp.roll(x, sign * bit, axis=1), x)
        bit *= 2
    return x


def _assemble_body(
    flat_c, flat_v, counts, flat_base, ncols: int, out_cap: int,
    use_pallas: bool = False,
    _stage: int = 99,
):
    """counts -> row_ptr; 128-wide windowed gathers build the flat CSR.

    Row gathers are descriptor-bound (docs/ROOFLINE.md), so the export
    moves whole 128-lane windows: cols + value bits interleave into ONE
    [T/128, 256] window source (two descriptors fetch a straddled
    window's col AND val lanes), a VMEM log-roll align kernel
    (pallas_sort.align_windows) aligns each window, and the <=127
    leading slots of every output row — the only slots a straddling
    window gets wrong — are repaired with an m-scale ALIGNED row
    scatter: each row's exact head is gathered from its (static)
    flat_base, rolled right by starts%128, split across the two window
    rows it lands in, and scatter-ADDed under disjoint masks (each
    output slot belongs to exactly one row head).  No element-granular
    descriptor is issued anywhere.  The per-window source position is
    ``kW + d[r(k)]`` with ``r(k)`` (the covering row of each window
    start) from an m-scale max-scatter + log-step cummax — window
    granularity, no nnz(C)-scale index cumsum.  The head-slot MASK does
    use one nnz(C)-scale interval-delta cumsum: that is bandwidth-class
    (~0.3 ms at s14) whereas riding the mask on the repair scatter as a
    third plane widens the row scatters 2W -> 3W and measured ~+3 ms
    (docs/ROOFLINE.md: row scatters bill per 128-lane chunk)."""
    m = counts.shape[0]
    W = _WA
    out_rp = exclusive_cumsum(counts).astype(INDEX_DTYPE)
    ocap = -(-out_cap // W) * W
    nwin = ocap // W
    total = out_rp[-1]
    nonempty = counts > 0
    starts = out_rp[:-1]
    d = jnp.where(nonempty, flat_base - starts, 0)

    # covering row of each window start: r(k) = last nonempty row with
    # start <= k*W.  Rows scatter (rowid+1) with MAX into the first
    # window they cover (ceil(start/W)); a log-step cummax spreads it.
    rid = jnp.arange(m, dtype=INDEX_DTYPE)
    cw = jnp.where(nonempty, (starts + W - 1) // W, nwin)
    rmax = jnp.zeros((nwin,), INDEX_DTYPE)
    rmax = rmax.at[cw].max(
        jnp.where(nonempty, rid + 1, 0), mode="drop"
    )
    rwin = jax.lax.associative_scan(jnp.maximum, rmax)
    rwin = jnp.maximum(rwin - 1, 0)
    idx0 = jnp.arange(nwin, dtype=INDEX_DTYPE) * W + jnp.take(d, rwin)
    if _stage == 0:
        return idx0

    # interleaved window source: [nr, 2W] rows = [cols W | val bits W]
    # NOTE: an unaligned `lax.gather` slice formulation (no straddle, no
    # roll) measures 3.7x faster on sources that fit VMEM but collapses
    # ~40x once the flat source exceeds it (tools/probe_wingather.py,
    # 366 ms fused at s14) — aligned row takes + the VMEM align kernel
    # are the scale-robust formulation.
    tpad = -(-flat_c.shape[0] // W) * W + 2 * W
    fc = jnp.concatenate(
        [flat_c, jnp.full((tpad - flat_c.shape[0],), ncols, jnp.int32)]
    )
    fvb = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(flat_v, jnp.int32),
            jnp.zeros((tpad - flat_v.shape[0],), jnp.int32),
        ]
    )
    src = jnp.concatenate(
        [fc.reshape(-1, W), fvb.reshape(-1, W)], axis=1
    )
    # materialization fence: in the FUSED single-dispatch program XLA
    # otherwise fuses this concat/reshape INTO the window takes below,
    # degrading 2-descriptor row gathers into element-granular addressing
    # (measured: fused total 31.3 ms vs 16.3 tiles + 6.5 asm standalone)
    src = jax.lax.optimization_barrier(src)
    nr = src.shape[0]
    if _stage == 10:  # profiling cutoff: window-source construction only
        return (jnp.sum(src),)

    def win_gather(p0):
        """[Q] flat positions -> ([Q, W] cols, [Q, W] f32 vals)."""
        wr = jnp.clip(p0 // W, 0, nr - 2)
        off = jnp.clip(p0 - wr * W, 0, W - 1)
        g = jnp.concatenate(
            [jnp.take(src, wr, axis=0), jnp.take(src, wr + 1, axis=0)],
            axis=1,
        )  # [Q, 4W]
        if use_pallas:
            # VMEM-resident variable roll: the XLA path below pays
            # log2(W) HBM round trips for the conditional rolls.
            # rows_per_step=64: at 8 the s14 grid was ~7.7k steps of
            # (8, 512) — per-step DMA latency dominated the kernel
            from .pallas_sort import align_windows

            rps = 64
            qn = g.shape[0]
            qpad = -(-qn // rps) * rps
            if qpad != qn:
                g = jnp.concatenate(
                    [g, jnp.zeros((qpad - qn, 4 * W), jnp.int32)]
                )
                off = jnp.concatenate(
                    [off, jnp.zeros((qpad - qn,), off.dtype)]
                )
            gc, gvb = align_windows(
                g,
                off[:, None].astype(jnp.int32),
                interpret=jax.default_backend() != "tpu",
                rows_per_step=rps,
            )
            return (
                gc[:qn],
                jax.lax.bitcast_convert_type(gvb[:qn], jnp.float32),
            )
        gc = jnp.concatenate([g[:, :W], g[:, 2 * W : 3 * W]], axis=1)
        gv = jnp.concatenate([g[:, W : 2 * W], g[:, 3 * W :]], axis=1)
        gc = _roll_sel(gc, off, W)[:, :W]
        gv = _roll_sel(gv, off, W)[:, :W]
        return gc, jax.lax.bitcast_convert_type(gv, jnp.float32)

    wc, wv = win_gather(idx0)  # [ocap/W, W]
    if _stage == 1:
        return wc.reshape(-1), wv.reshape(-1)

    # repair the first <=W-1 slots of every row (window continuity breaks
    # at row boundaries): exact heads via an m-scale window gather at
    # flat_base, rolled right by t = starts % W, scatter-added into the
    # two straddled window rows under disjoint masks.  Scatter rows are
    # the off-law primitive on this chip (~6x slower per descriptor than
    # gathers), so cols+val-bits+head-mask interleave into ONE (m, 3W)
    # scatter source per straddle side (2 scatters total); the mask
    # plane IS the repaired-slot mask — no per-slot start positions are
    # ever spread.
    fix_c, fix_v = win_gather(jnp.where(nonempty, flat_base, 0))
    lane = jnp.arange(W, dtype=INDEX_DTYPE)[None, :]
    okf = nonempty[:, None] & (lane < counts[:, None])
    t = jnp.where(nonempty, starts % W, 0)
    q0 = starts // W
    stk = jnp.concatenate(
        [fix_c, jax.lax.bitcast_convert_type(fix_v, jnp.int32)], axis=0
    )  # (2m, W): col rows stacked over value-bit rows
    rstk = _roll_sel(stk, jnp.concatenate([t, t]), W, right=True)
    rc, rvb = rstk[:m], rstk[m:]
    rm = _roll_sel(okf.astype(jnp.int32), t, W, right=True)
    m_a = (rm > 0) & (lane >= t[:, None])  # head part in window q0
    m_b = (rm > 0) & (lane < t[:, None])  # spill into window q0 + 1
    tgt_a = jnp.where(nonempty, q0, nwin)
    tgt_b = jnp.where(nonempty & (t > 0), q0 + 1, nwin)
    src_a = jnp.concatenate(
        [jnp.where(m_a, rc, 0), jnp.where(m_a, rvb, 0)], axis=1
    )
    src_b = jnp.concatenate(
        [jnp.where(m_b, rc, 0), jnp.where(m_b, rvb, 0)], axis=1
    )
    acc = jnp.zeros((nwin, 2 * W), jnp.int32)
    acc = acc.at[tgt_a].add(src_a, mode="drop")
    acc = acc.at[tgt_b].add(src_b, mode="drop")
    # head-slot mask computed analytically — slot q is repaired iff its
    # in-row offset q - start(row(q)) < W, with start(row(q)) spread by
    # an interval-delta scatter + cumsum.  A third mask plane riding the
    # repair scatter was tried instead and REVERTED: widening the
    # (m, 2W) scatter source to (m, 3W) cost ~+3 ms at s14 (row scatters
    # bill per 128-lane chunk) while the nnz(C)-scale cumsum here is
    # bandwidth-class (~0.3 ms; docs/ROOFLINE.md).
    if use_pallas:
        from .pallas_scan import cumsum_i32

        _long_cumsum = partial(
            cumsum_i32, interpret=jax.default_backend() != "tpu"
        )
    else:
        _long_cumsum = jnp.cumsum

    def ff(x, y):
        xv, xk = x
        yv, yk = y
        return (jnp.where(yk, yv, xv), xk | yk)

    q = jnp.arange(ocap, dtype=INDEX_DTYPE)
    ds = jnp.where(nonempty, starts, 0)
    filled_s, _ = jax.lax.associative_scan(ff, (ds, nonempty), axis=0)
    prevs = jnp.concatenate([jnp.zeros((1,), ds.dtype), filled_s[:-1]])
    dds = jnp.zeros((ocap,), INDEX_DTYPE)
    dds = dds.at[jnp.where(nonempty, starts, ocap)].add(
        jnp.where(nonempty, ds - prevs, 0), mode="drop"
    )
    start_q = _long_cumsum(dds)
    fixed = ((q - start_q) < W).reshape(nwin, W)
    ccol = jnp.where(fixed, acc[:, :W], wc).reshape(-1)
    cval = jnp.where(
        fixed,
        jax.lax.bitcast_convert_type(acc[:, W:], jnp.float32),
        wv,
    ).reshape(-1)

    qvalid = q < total
    ccol = jnp.where(qvalid, ccol, ncols).astype(INDEX_DTYPE)
    cval = jnp.where(qvalid, cval, 0.0).astype(QVALUE_DTYPE)
    return CSR(jnp.minimum(out_rp, ocap), ccol, cval, ncols)


@partial(jax.jit, static_argnames=("ncols", "out_cap", "use_pallas"))
def _assemble_jit(
    flat_c, flat_v, counts, flat_base, ncols: int, out_cap: int,
    use_pallas: bool = False,
):
    return _assemble_body(
        flat_c, flat_v, counts, flat_base, ncols, out_cap, use_pallas
    )


def _flat_assemble(
    flat_c,
    flat_v,
    counts,
    flat_base,
    ncols: int,
    out_cap: int | None,
    exact: bool,
    use_pallas: bool | None = None,
) -> CSR:
    """Shared flat-CSR export (also used by formats.tiled.TiledCSR)."""
    if out_cap is None:
        if exact:
            nnzc = int(jnp.sum(counts))
            # geometric 1.25x buckets bound both recompiles and overshoot
            out_cap = 1024
            while out_cap < nnzc:
                out_cap = int(out_cap * 1.25 + 1023) & ~1023
        else:
            out_cap = int(counts.shape[0]) * ncols
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    return _assemble_jit(
        flat_c, flat_v, counts, flat_base, ncols, int(out_cap), use_pallas
    )


def _use_pallas_default() -> bool:
    return jax.default_backend() == "tpu"


def spgemm_ell_tiled(a: CSR, b: CSR, plan: EllPlan | None = None):
    """C = A·B returned in the framework's native TiledCSR form (no
    element-granularity assembly — the fast path for chained ops)."""
    from ..formats.tiled import TiledCSR

    if plan is None:
        plan = plan_ell(a, b)
    flat_c, flat_v, counts, flat_base = _tiles_impl(
        a, b, plan, plan.chunk, _use_pallas_default()
    )
    return TiledCSR(flat_c, flat_v, counts, flat_base, plan.ncols)


def spgemm_ell(
    a: CSR,
    b: CSR,
    plan: EllPlan | None = None,
    out_cap: int | None = None,
    exact: bool = True,
) -> CSR:
    """C = A·B via the ELL-ESC pipeline (ordered, duplicate-summed).

    ``exact=True`` host-syncs the exact nnz(C) after the symbolic/compute
    phase and sizes the output to the next power of two (the reference
    GPU pipeline does the same device->host nnz read, gpu_csr_kernel.cu:
    152); ``exact=False`` uses the static upper bound from the plan.
    """
    if plan is None:
        plan = plan_ell(a, b)
    up = _use_pallas_default()
    cached = getattr(plan, "_nnzc_cache", None)
    if out_cap is None and exact and cached is not None:
        # nnz(C) bucket known from a prior call: fuse both phases into one
        # dispatch.  Counts are value-dependent (the dense hub path drops
        # exact-zero products), so the bucket is VALIDATED BEFORE the CSR
        # is handed out: the fused dispatch returns its nnz(C) device
        # scalar and this call blocks on that one int32 (the caller was
        # about to block on the result anyway; timing-critical callers —
        # bench.py, cli/corpus.py — slope-time ``_tiles_impl`` directly
        # and pay no sync).  An overflowed bucket means the trailing rows
        # were truncated — warn, drop the cache, and fall through to the
        # exact two-phase path so no caller ever consumes a truncated
        # CSR (VERDICT r2 #5).
        csr, nnzc = _tiles_impl(
            a, b, plan, plan.chunk, up, fused_out_cap=cached
        )
        if int(nnzc) <= cached:
            return csr
        import warnings

        warnings.warn(
            "spgemm_ell: fused nnz(C) bucket overflowed "
            f"(nnzc={int(nnzc)} > cap={cached}); the fused output was "
            "truncated and is discarded. Re-deriving two-phase.",
            RuntimeWarning,
            stacklevel=2,
        )
        object.__setattr__(plan, "_nnzc_cache", None)
    flat_c, flat_v, counts, flat_base = _tiles_impl(a, b, plan, plan.chunk, up)
    if out_cap is None and not exact:
        out_cap = plan.out_cap
    if out_cap is None and exact:
        nnzc = int(jnp.sum(counts))
        cap = 1024
        while cap < nnzc:
            cap = int(cap * 1.25 + 1023) & ~1023
        object.__setattr__(plan, "_nnzc_cache", cap)
        out_cap = cap
    return _flat_assemble(
        flat_c, flat_v, counts, flat_base, plan.ncols, out_cap, exact
    )


def spgemm_ell_symbolic(a: CSR, b: CSR, plan: EllPlan | None = None):
    """Exact per-row nnz(C) + row_ptr without assembly (two-phase API
    parity with cpu_csr_kernel.h:63-102)."""
    if plan is None:
        plan = plan_ell(a, b)
    _, _, counts, _ = _tiles_impl(
        a, b, plan, plan.chunk, _use_pallas_default()
    )
    row_ptr = exclusive_cumsum(counts).astype(INDEX_DTYPE)
    return row_ptr, row_ptr[-1]


# expose the one-shot impl for tests that pin chunk/max_w
def _spgemm_ell_impl(a: CSR, b: CSR, plan: EllPlan, chunk: int) -> CSR:
    flat_c, flat_v, counts, flat_base = _tiles_impl(a, b, plan, chunk)
    return _assemble_jit(
        flat_c, flat_v, counts, flat_base, plan.ncols, plan.out_cap
    )
