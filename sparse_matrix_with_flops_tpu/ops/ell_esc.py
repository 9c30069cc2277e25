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
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import INDEX_DTYPE, QVALUE_DTYPE
from ..formats.csr import CSR
from .segments import exclusive_cumsum, repeat_segments


def _pow2ceil(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


CHUNK = 64  # chunk width: row-gather granularity (tuned: 64 beats 128 by ~17%)
MAX_W = 8192  # largest row tile; beyond -> huge fallback


@dataclasses.dataclass(frozen=True, eq=False)
class EllPlan:
    """Static per-structure plan (identity-hashed jit static arg)."""

    # B re-layout: one ELL array per segment-width class
    b_classes: tuple  # tuple[(S, np.int32[rows_S] b_row_ids)]
    # expansion: per class, the A entries whose B row is in that class
    ent_classes: tuple  # tuple[(S, np.int32[E_S] a_entry_idx, np.int32[E_S] b_slot)]
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

    __hash__ = object.__hash__


def _qpad8(n: int) -> int:
    """Quantised padding: next power of two, min 8 — keeps bin shapes in a
    small set so re-planning across R-MCL iterations hits the jit cache."""
    return max(8, _pow2ceil(n))


def plan_ell(
    a: CSR,
    b: CSR,
    chunk: int = CHUNK,
    max_w: int = MAX_W,
    quantize: bool = False,
) -> EllPlan:
    rp = np.asarray(a.row_ptr, dtype=np.int64)
    nnz = int(rp[-1])
    acol = np.asarray(a.col_ind)[:nnz]
    brp = np.asarray(b.row_ptr, dtype=np.int64)
    bcounts = np.diff(brp)
    m = a.rows

    safe = np.clip(acol, 0, b.rows - 1)
    elen = bcounts[safe].astype(np.int64)
    # per-entry padded width (0 for empty segments — they emit nothing)
    epw = np.where(
        elen > 0, np.maximum(chunk, 2 ** np.ceil(np.log2(np.maximum(elen, 1))).astype(np.int64)), 0
    )
    counts_a = np.diff(rp)
    erow = np.repeat(np.arange(m), counts_a)
    prow_w = np.zeros(m, dtype=np.int64)  # padded row width
    np.add.at(prow_w, erow, epw)
    rf = np.zeros(m, dtype=np.int64)
    np.add.at(rf, erow, elen)

    # ---- B classes ------------------------------------------------------
    bpw = np.where(
        bcounts > 0,
        np.maximum(chunk, 2 ** np.ceil(np.log2(np.maximum(bcounts, 1))).astype(np.int64)),
        0,
    )
    b_classes = []
    b_class_of_row = np.full(b.rows, -1, np.int32)
    b_slot_of_row = np.zeros(b.rows, np.int32)
    max_s = (
        max(_pow2ceil(int(bcounts.max())), chunk)
        if bcounts.size and bcounts.max() > 0
        else 0
    )
    s = chunk
    while s <= max_s:
        sel = np.nonzero(bpw == s)[0]
        if sel.size:
            b_class_of_row[sel] = len(b_classes)
            b_slot_of_row[sel] = np.arange(sel.size, dtype=np.int32)
            if quantize:
                pad = _qpad8(sel.size) - sel.size
                sel = np.concatenate([sel, np.full(pad, -1, sel.dtype)])
            b_classes.append((int(s), sel.astype(np.int32)))
        s *= 2

    # ---- chunk layout over the B-ELL class arrays -----------------------
    # tile gathers read B-ELL chunks DIRECTLY (values scaled by the A value
    # per chunk afterwards) — no intermediate per-entry product copy.
    ent_classes = ()  # kept for dataclass compat; expansion needs no lists
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
    # first B-ELL chunk of each A entry
    ent_chunk_start = np.zeros(nnz, dtype=np.int64)
    ent_cpe = np.zeros(nnz, dtype=np.int64)
    act = elen > 0
    cls = b_class_of_row[safe]
    for ci, (S, b_rows) in enumerate(b_classes):
        cpe = S // chunk
        sel_e = np.nonzero(act & (cls == ci))[0]
        ent_chunk_start[sel_e] = (
            class_chunk_base[ci]
            + b_slot_of_row[safe[sel_e]].astype(np.int64) * cpe
        )
        ent_cpe[sel_e] = cpe

    # ---- row tile bins (vectorised tile_src construction) ---------------
    wr = np.where(prow_w > 0, np.maximum(chunk, prow_w), 0)
    wr_p2 = np.zeros(m, dtype=np.int64)
    pos = wr > 0
    wr_p2[pos] = 2 ** np.ceil(np.log2(wr[pos])).astype(np.int64)
    bins = []
    row_bin = np.full(m, -1, np.int32)
    row_slot = np.zeros(m, np.int32)
    ne_all = (epw // chunk).astype(np.int64)  # chunks per entry
    # within-row chunk offset of each entry (entries are row-major)
    ne_cum = np.zeros(nnz + 1, dtype=np.int64)
    np.cumsum(ne_all, out=ne_cum[1:])
    row_first_cum = ne_cum[rp[:-1]]  # per row: cum chunks before its entries
    wrc = ne_cum[:-1] - np.repeat(row_first_cum, counts_a)
    w = chunk
    while w <= max_w:
        sel = np.nonzero(wr_p2 == w)[0]
        if sel.size:
            bi = len(bins)
            row_bin[sel] = bi
            row_slot[sel] = np.arange(sel.size, dtype=np.int32)
            cpr = w // chunk
            rpad = _qpad8(sel.size) if quantize else sel.size
            # entries belonging to the bin's rows, with their target slots
            in_bin = np.zeros(m, dtype=bool)
            in_bin[sel] = True
            e_sel = np.nonzero(in_bin[erow] & (ne_all > 0))[0]
            ne = ne_all[e_sel]
            tot = int(ne.sum())
            base_rep = np.repeat(ent_chunk_start[e_sel], ne)
            within = np.arange(tot, dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(ne)[:-1]]), ne
            )
            src_vals = base_rep + within
            dest = (
                np.repeat(
                    row_slot[erow[e_sel]].astype(np.int64) * cpr
                    + wrc[e_sel],
                    ne,
                )
                + within
            )
            tile_src = np.full(rpad * cpr, sentinel_chunk, dtype=np.int64)
            tile_src[dest] = src_vals
            tile_ent = np.zeros(rpad * cpr, dtype=np.int64)
            tile_ent[dest] = np.repeat(e_sel, ne)
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
                    tile_src.astype(np.int32),
                    tile_ent.astype(np.int32),
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
        np.concatenate([np.arange(rp[r], rp[r + 1]) for r in huge]).astype(
            np.int32
        )
        if huge.size
        else np.zeros(0, np.int32)
    )
    huge_flops = max(int(rf[huge].sum()), 1) if huge.size else 1

    out_cap = int(np.minimum(rf, b.ncols).sum())
    return EllPlan(
        b_classes=tuple(b_classes),
        ent_classes=tuple(ent_classes),
        class_chunk_base=tuple(class_chunk_base),
        total_chunks=total_chunks,
        bins=tuple(bins),
        huge_rows=huge,
        huge_rp=huge_rp.astype(np.int32),
        huge_src=huge_src,
        huge_flops=huge_flops,
        rows=m,
        ncols=b.ncols,
        out_cap=max(out_cap, 1),
        row_bin=row_bin,
        row_slot=row_slot,
        chunk=int(chunk),
    )


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
    # huge rows go through the dense-MXU path: their compacted region is
    # one full-width row each
    flat_base[plan.huge_rows] = huge_start + np.arange(
        plan.huge_rows.size, dtype=np.int64
    ) * plan.ncols
    base += plan.huge_rows.size * plan.ncols
    lay = {
        "bin_starts": tuple(bin_starts),
        "flat_base": flat_base,
        "huge_start": huge_start,
        "flat_total": base,
    }
    object.__setattr__(plan, "_layout_cache", lay)
    return lay


@partial(
    jax.jit, static_argnames=("plan", "chunk", "use_pallas", "fused_out_cap")
)
def _tiles_impl(
    a: CSR,
    b: CSR,
    plan: EllPlan,
    chunk: int,
    use_pallas: bool = False,
    fused_out_cap: int | None = None,
):
    """Phase 1: expansion + per-bin sort/dedup/compaction.

    Returns (flat cols [T] int32, flat vals [T] f32, counts [m],
    flat_base [m] incl. huge rows).
    """
    m, ncols = plan.rows, plan.ncols
    lay = _flat_layout(plan)

    # 1. B ELL classes (element gather at ~2*nnzB scale)
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
        idx = jnp.clip(start + lanes, 0, b.capacity - 1)
        valid = lanes < cnt
        ec = jnp.where(valid, jnp.take(b.col_ind, idx), ncols)
        ev = jnp.where(valid, jnp.take(b.values, idx), 0.0)
        # one sentinel row at the end: target of padded entry slots
        ec = jnp.concatenate(
            [ec, jnp.full((1, S), ncols, INDEX_DTYPE)], axis=0
        )
        ev = jnp.concatenate([ev, jnp.zeros((1, S), QVALUE_DTYPE)], axis=0)
        b_ells.append((ec.astype(INDEX_DTYPE), ev.astype(QVALUE_DTYPE)))

    # 2. chunk view of the B-ELL classes (tile gathers read these
    # directly; values are scaled by the owning A entry's value per chunk)
    if b_ells:
        prod_c = jnp.concatenate(
            [ec.reshape(-1, chunk) for ec, _ in b_ells], axis=0
        )
        prod_v = jnp.concatenate(
            [ev.reshape(-1, chunk) for _, ev in b_ells], axis=0
        )
    else:
        prod_c = jnp.full((1, chunk), ncols, INDEX_DTYPE)
        prod_v = jnp.zeros((1, chunk), QVALUE_DTYPE)

    # 3-4. per-bin row tiles: gather chunks, scale, sort, dedup, compact
    counts = jnp.zeros((m,), INDEX_DTYPE)
    cols_parts, vals_parts = [], []
    for bi, (W, row_ids, tile_src, tile_ent) in enumerate(plan.bins):
        src = jnp.asarray(tile_src)
        aval = jnp.take(a.values, jnp.asarray(tile_ent))[:, None]
        tc = jnp.take(prod_c, src, axis=0).reshape(-1, W)  # row gather
        tv = (jnp.take(prod_v, src, axis=0) * aval).reshape(-1, W)
        if use_pallas:
            from .pallas_sort import sort_dedup_compact

            rpadded = -(-tc.shape[0] // 8) * 8
            if rpadded != tc.shape[0]:
                padr = rpadded - tc.shape[0]
                tc = jnp.concatenate(
                    [tc, jnp.full((padr, W), ncols, INDEX_DTYPE)], axis=0
                )
                tv = jnp.concatenate([tv, jnp.zeros((padr, W))], axis=0)
            key2, uval = sort_dedup_compact(tc, tv, ncols)
            key2 = key2[: len(tile_src) // (W // chunk)]
            uval = uval[: key2.shape[0]]
        else:
            tc, tv = jax.lax.sort((tc, tv), dimension=1, num_keys=1)
            csum = jnp.cumsum(tv, axis=1)
            nxt = jnp.concatenate(
                [tc[:, 1:], jnp.full((tc.shape[0], 1), ncols, INDEX_DTYPE)],
                axis=1,
            )
            is_last = (tc != nxt) & (tc < ncols)
            key2 = jnp.where(is_last, tc, ncols)
            key2, csum2 = jax.lax.sort((key2, csum), dimension=1, num_keys=1)
            prev = jnp.concatenate(
                [jnp.zeros((key2.shape[0], 1), QVALUE_DTYPE), csum2[:, :-1]],
                axis=1,
            )
            uval = jnp.where(key2 < ncols, csum2 - prev, 0.0)
        cnt = jnp.sum(key2 < ncols, axis=1).astype(INDEX_DTYPE)
        rid = jnp.asarray(row_ids)
        counts = counts.at[jnp.where(rid >= 0, rid, m)].set(
            cnt, mode="drop"
        )
        cols_parts.append(key2.reshape(-1))
        vals_parts.append(uval.reshape(-1))

    flat_base = jnp.asarray(lay["flat_base"].astype(np.int32))
    # Heavy rows (flops of order ncols or more) go DENSE on the MXU: the
    # reference's dense-accumulator idea (cpu_csr_kernel.h thread_data /
    # DenseMatrix) reborn — scatter A_huge and B to dense, one big matmul
    # (flops are nearly free on the MXU), then one minor-axis sort compacts
    # each dense row back to sparse.
    if plan.huge_rows.size:
        H = plan.huge_rows.size
        K, N = b.rows, ncols
        # B densified in column slabs, huge rows processed in row chunks,
        # both to bound peak HBM (scale 16 exceeds 15.75G otherwise)
        slab = N
        while K * slab * 4 > (256 << 20) and slab > 256:
            slab = -(-slab // 2)
        n_slabs = -(-N // slab)
        b_erow = b.entry_rows()
        b_slabs = []
        for sl in range(n_slabs):
            col_local = b.col_ind - sl * slab
            tgt = jnp.where(
                b.entry_valid() & (col_local >= 0) & (col_local < slab),
                col_local,
                slab,
            )
            b_d = jnp.zeros((K, slab), QVALUE_DTYPE)
            b_slabs.append(
                b_d.at[jnp.clip(b_erow, 0, K - 1), tgt].add(
                    b.values, mode="drop"
                )
            )
        # NOTE: densification cannot represent explicit zeros, so products
        # that cancel to exactly 0.0 are dropped for huge rows (raw-equal
        # semantics; the tile path keeps them).
        HC = 1024 if H > 1024 else H  # huge-row chunk
        hlens = np.diff(plan.huge_rp)
        hcounts = []
        for h0 in range(0, H, HC):
            h1 = min(h0 + HC, H)
            hc = h1 - h0
            e0, e1 = int(plan.huge_rp[h0]), int(plan.huge_rp[h1])
            src = jnp.asarray(plan.huge_src[e0:e1])
            rows_rep = jnp.asarray(
                np.repeat(
                    np.arange(hc, dtype=np.int32), hlens[h0:h1]
                )
            )
            a_d = jnp.zeros((hc, K), QVALUE_DTYPE)
            a_d = a_d.at[
                rows_rep, jnp.clip(jnp.take(a.col_ind, src), 0, K - 1)
            ].add(jnp.take(a.values, src))
            c_d = jnp.concatenate(
                [
                    jnp.dot(a_d, bd, preferred_element_type=jnp.float32)
                    for bd in b_slabs
                ],
                axis=1,
            )[:, :N]
            lanes = jax.lax.broadcasted_iota(INDEX_DTYPE, (hc, N), 1)
            key = jnp.where(c_d != 0, lanes, N)
            key, vals = jax.lax.sort((key, c_d), dimension=1, num_keys=1)
            hcounts.append(jnp.sum(key < N, axis=1).astype(INDEX_DTYPE))
            cols_parts.append(key.reshape(-1))
            vals_parts.append(vals.reshape(-1))
        counts = counts.at[jnp.asarray(plan.huge_rows)].set(
            jnp.concatenate(hcounts), mode="drop"
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
        csr = _assemble_body(
            flat_c, flat_v, counts, flat_base, ncols, fused_out_cap,
            use_pallas,
        )
        return csr, jnp.sum(counts)
    return flat_c, flat_v, counts, flat_base


def _assemble_body(
    flat_c, flat_v, counts, flat_base, ncols: int, out_cap: int,
    use_pallas: bool = False,
):
    """counts -> row_ptr; windowed gathers build the flat CSR.

    Row gathers are descriptor-bound, so the export gathers 16-element
    aligned windows per plane (cols, vals stored planar — a [T,2] pair
    array makes XLA copy it into a 128-lane-padded layout, 64x memory) and
    repairs the <=15 leading slots of every row (whose window crossed a
    row boundary) with one m-scale gather+scatter.  The per-slot source
    index comes from a scatter + cumsum (interval deltas), not a gather."""
    m = counts.shape[0]
    WQ = 16  # output window (elements)
    out_rp = exclusive_cumsum(counts).astype(INDEX_DTYPE)
    ocap = -(-out_cap // 128) * 128
    q = jnp.arange(ocap, dtype=INDEX_DTYPE)
    total = out_rp[-1]
    qvalid = q < total
    nonempty = counts > 0
    starts = out_rp[:-1]

    # source index per slot: idx = q + d[row(q)], with d[row] spread via
    # interval-delta scatter + cumsum (no gathers).
    d = jnp.where(nonempty, flat_base - starts, 0)

    def ff(a, b):
        av, ak = a
        bv, bk = b
        return (jnp.where(bk, bv, av), ak | bk)

    filled, _ = jax.lax.associative_scan(ff, (d, nonempty), axis=0)
    prevd = jnp.concatenate([jnp.zeros((1,), d.dtype), filled[:-1]])
    dd = jnp.zeros((ocap,), INDEX_DTYPE)
    dd = dd.at[jnp.where(nonempty, starts, ocap)].add(
        jnp.where(nonempty, d - prevd, 0), mode="drop"
    )
    idx = q + jnp.cumsum(dd)

    # The Pallas align kernel needs (8,128)-granular blocks (Mosaic
    # minimum) which costs 8x read amplification; keep it opt-in until the
    # DMA formulation lands.  Default: XLA windowed gathers.
    import os as _os

    if use_pallas and _os.environ.get("SMF_ALIGN_KERNEL"):
        from .pallas_align import window_align_gather

        # 128-lane source rows + 1 slack row; the align kernel DMAs the
        # two straddled rows per 16-window and rolls them into place
        tpad = -(-flat_c.shape[0] // 128) * 128 + 128
        fc2 = jnp.concatenate(
            [flat_c, jnp.full((tpad - flat_c.shape[0],), ncols, jnp.int32)]
        ).reshape(-1, 128)
        fv2 = jnp.concatenate(
            [flat_v, jnp.zeros((tpad - flat_v.shape[0],), jnp.float32)]
        ).reshape(-1, 128)
        p0 = idx[::WQ]
        wr = jnp.clip(p0 // 128, 0, fc2.shape[0] - 2)
        off = jnp.clip(p0 - wr * 128, 0, 127)
        interp = jax.default_backend() != "tpu"
        ccol = window_align_gather(fc2, wr, off, interpret=interp)
        cval = window_align_gather(fv2, wr, off, interpret=interp)
    else:
        tpad = -(-flat_c.shape[0] // 16) * 16 + 64
        fc = jnp.concatenate(
            [flat_c, jnp.full((tpad - flat_c.shape[0],), ncols, jnp.int32)]
        )
        fv = jnp.concatenate(
            [flat_v, jnp.zeros((tpad - flat_v.shape[0],), jnp.float32)]
        )
        src_c = fc.reshape(-1, 16)
        src_v = fv.reshape(-1, 16)
        p0 = idx[::WQ]
        wr = jnp.clip(p0 // 16, 0, src_c.shape[0] - 2)
        off = jnp.clip(p0 - wr * 16, 0, 15)[:, None]

        def windowed(src):
            g = jnp.concatenate(
                [jnp.take(src, wr, axis=0), jnp.take(src, wr + 1, axis=0)],
                axis=1,
            )  # [Q, 32]
            acc = g[:, :WQ]
            for o in range(1, 16):
                acc = jnp.where(off == o, g[:, o : o + WQ], acc)
            return acc.reshape(-1)

        ccol = windowed(src_c)
        cval = windowed(src_v)

    # repair the first WQ-1 slots of every row (window continuity breaks
    # at row boundaries): m-scale gathers + scatters
    k = jnp.arange(WQ - 1, dtype=INDEX_DTYPE)[None, :]
    fsrc = jnp.clip(flat_base[:, None] + k, 0, flat_c.shape[0] - 1).reshape(-1)
    fix_c = jnp.take(flat_c, fsrc)
    fix_v = jnp.take(flat_v, fsrc)
    tgt = starts[:, None] + k
    okf = nonempty[:, None] & (k < counts[:, None])
    tgt = jnp.where(okf, tgt, ocap).reshape(-1)
    ccol = ccol.at[tgt].set(fix_c, mode="drop")
    cval = cval.at[tgt].set(fix_v, mode="drop")

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
        # exact-zero products), so the bucket is validated ONE CALL BEHIND:
        # each fused call returns its nnz(C) device scalar, and the next
        # call reads it (already materialized — no extra device sync on
        # the producing dispatch) before trusting the bucket again.
        prev = getattr(plan, "_nnzc_pending", None)
        if prev is None or int(prev) <= cached:
            csr, nnzc = _tiles_impl(
                a, b, plan, plan.chunk, up, fused_out_cap=cached
            )
            object.__setattr__(plan, "_nnzc_pending", nnzc)
            return csr
        # the PREVIOUS fused call overflowed its bucket (its trailing rows
        # were truncated): drop the cache and re-derive exactly.
        import warnings

        warnings.warn(
            "spgemm_ell: fused nnz(C) bucket overflowed on the previous "
            f"call (nnzc={int(prev)} > cap={cached}); its output was "
            "truncated. Re-deriving the capacity two-phase.",
            RuntimeWarning,
            stacklevel=2,
        )
        object.__setattr__(plan, "_nnzc_cache", None)
        object.__setattr__(plan, "_nnzc_pending", None)
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
