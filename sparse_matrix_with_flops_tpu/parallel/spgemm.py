"""Distributed SpGEMM: row-partitioned A/C, all-gathered B over the mesh.

The layer the reference does not have (SURVEY.md §2.6: no distributed
backend; its closest gestures are PCSR column stripes, PCSR.cc:3-56, and
per-thread private outputs, mvcsr.cc:124-226).  TPU-native design:

* A and C are row-sharded (`PartitionSpec('x')` on the shard-stack axis) —
  each chip owns a contiguous block of rows, permuted for equal flops.
* B is all-gathered across the mesh inside the kernel (jax.lax.all_gather
  over ICI) and consumed through a :class:`BView` without restitching —
  the SpGEMM analogue of a ragged all-gather of remote KV blocks.
* Each chip runs the same single-chip ESC pipeline on its rows; there is
  no cross-chip reduction because Gustavson rows are independent.

The result never leaves the chips: it stays a ShardedCSR for the next op
(the R-MCL loop keeps the iterate device-resident, mirroring gpuRmclIter,
gpu_csr_kernel.cu:281-311).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..config import INDEX_DTYPE, QVALUE_DTYPE
from ..formats.csr import CSR
from ..ops.spgemm import bview_from_blocks, esc_expand_view, esc_sort
from ..ops.segments import exclusive_cumsum, repeat_segments
from .mesh import ROW_AXIS
from .sharded import ShardedCSR


def _local_spgemm(
    a_rp, a_ci, a_v, bv, ncols: int, product_cap: int, out_cap: int
):
    """Single-shard ESC SpGEMM of the local A block against a B view."""
    a = CSR(a_rp, a_ci, a_v, bv.rows)  # a.ncols only checked, use B rows
    m = a.rows
    prow, pcol, pval, flops = esc_expand_view(a, bv, product_cap)
    prow, pcol, pval, pvalid, flags, seg, nnzc = esc_sort(prow, pcol, pval, m)
    seg = jnp.where(pvalid, seg, out_cap)
    cval = jnp.zeros((out_cap,), QVALUE_DTYPE).at[seg].add(pval, mode="drop")
    crow = jnp.full((out_cap,), m, INDEX_DTYPE).at[seg].min(prow, mode="drop")
    ccol = jnp.full((out_cap,), ncols, INDEX_DTYPE).at[seg].min(pcol, mode="drop")
    row_ptr = jnp.searchsorted(
        crow, jnp.arange(m + 1, dtype=INDEX_DTYPE)
    ).astype(INDEX_DTYPE)
    return row_ptr, ccol, cval, flops, nnzc


@partial(
    jax.jit,
    static_argnames=("mesh", "product_cap", "out_cap", "axis"),
)
def sharded_spgemm(
    mesh,
    a: ShardedCSR,
    b: ShardedCSR,
    product_cap: int,
    out_cap: int,
    axis: str = ROW_AXIS,
) -> tuple[ShardedCSR, dict]:
    """C = A·B with A, B, C all row-sharded over ``mesh``.

    ``product_cap`` / ``out_cap`` are *per-shard* capacities (flops-balanced
    sharding keeps them near total/D).  Returns (C sharded, info dict with
    per-shard flops / nnz arrays).
    """
    ncols = b.ncols

    def kernel(a_rp, a_ci, a_v, b_rp, b_ci, b_v):
        # blocks arrive with leading shard axis of size 1
        g_rp = jax.lax.all_gather(b_rp[0], axis)  # [D, lr+1]
        g_ci = jax.lax.all_gather(b_ci[0], axis)  # [D, lcap]
        g_v = jax.lax.all_gather(b_v[0], axis)
        bv = bview_from_blocks(g_rp, g_ci, g_v, ncols)
        c_rp, c_ci, c_v, flops, nnzc = _local_spgemm(
            a_rp[0], a_ci[0], a_v[0], bv, ncols, product_cap, out_cap
        )
        return (
            c_rp[None],
            c_ci[None],
            c_v[None],
            flops[None],
            nnzc[None],
        )

    spec = P(axis)
    c_rp, c_ci, c_v, flops, nnzc = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(spec,) * 6,
        out_specs=(spec,) * 5,
        check_vma=False,
    )(a.row_ptr, a.col_ind, a.values, b.row_ptr, b.col_ind, b.values)
    c = ShardedCSR(c_rp, c_ci, c_v, ncols, a.global_rows)
    return c, {"flops": flops, "nnz": nnzc}


@partial(
    jax.jit,
    static_argnames=("mesh", "product_cap", "out_cap", "axis"),
)
def sharded_spgemm_ring(
    mesh,
    a: ShardedCSR,
    b: ShardedCSR,
    product_cap: int,
    out_cap: int,
    axis: str = ROW_AXIS,
) -> tuple[ShardedCSR, dict]:
    """C = A·B with B ROTATED around the mesh instead of all-gathered.

    The memory-scalable exchange (SURVEY.md §2.6 last row): B's blocks
    ring-rotate via `jax.lax.ppermute` as the reference blueprint's
    two-step ragged protocol — a cheap LENGTHS rotation first (per-entry
    B-row counts fix every product's flops offset), then the ROWS
    rotation fills each resident block's products in place.  Per-chip
    peak B footprint is 2 blocks (2·nnz(B)/D) instead of the whole
    operand, so adding chips grows the feasible matrix size.  The cost is
    D masked passes over the product stream; prefer
    :func:`sharded_spgemm` when B fits per-chip HBM.
    """
    ncols = b.ncols
    d = mesh.devices.size
    lr = b.local_rows
    lcap = b.local_capacity
    perm = [(i, (i + 1) % d) for i in range(d)]

    def kernel(a_rp, a_ci, a_v, b_rp, b_ci, b_v):
        me = jax.lax.axis_index(axis)
        a_rp0, a_ci0, a_v0 = a_rp[0], a_ci[0], a_v[0]
        m = a_rp0.shape[0] - 1
        cap = a_ci0.shape[0]
        valid = jnp.arange(cap, dtype=INDEX_DTYPE) < a_rp0[-1]

        # rotation 1: lengths — per-A-entry B-row counts
        cnt_blk = (b_rp[0][1:] - b_rp[0][:-1]).astype(INDEX_DTYPE)
        ef = jnp.zeros((cap,), INDEX_DTYPE)
        for k in range(d):
            owner = (me - k) % d
            loc = a_ci0 - owner * lr
            inb = valid & (loc >= 0) & (loc < lr)
            c = jnp.take(cnt_blk, jnp.clip(loc, 0, lr - 1))
            ef = jnp.where(inb, c, ef)
            if k + 1 < d:
                cnt_blk = jax.lax.ppermute(cnt_blk, axis, perm)

        starts = exclusive_cumsum(ef)
        total = starts[-1]
        p = repeat_segments(starts[:-1], valid & (ef > 0), product_cap)
        q = jnp.arange(product_cap, dtype=INDEX_DTYPE)
        pvalid = q < total
        safe_p = jnp.clip(p, 0, cap - 1)
        erow = jnp.repeat(
            jnp.arange(m, dtype=INDEX_DTYPE),
            a_rp0[1:] - a_rp0[:-1],
            total_repeat_length=cap,
        )
        arow = jnp.take(erow, safe_p)
        acol = jnp.take(a_ci0, safe_p)
        aval = jnp.take(a_v0, safe_p)
        t = q - jnp.take(starts, safe_p)

        # rotation 2: rows — fill products from the resident block
        pcol = jnp.full((product_cap,), ncols, INDEX_DTYPE)
        pval = jnp.zeros((product_cap,), QVALUE_DTYPE)
        blk_rp, blk_ci, blk_v = b_rp[0], b_ci[0], b_v[0]
        for k in range(d):
            owner = (me - k) % d
            loc = acol - owner * lr
            inb = pvalid & (loc >= 0) & (loc < lr)
            b_start = jnp.take(blk_rp[:-1], jnp.clip(loc, 0, lr - 1))
            b_idx = jnp.clip(b_start + t, 0, lcap - 1)
            pcol = jnp.where(inb, jnp.take(blk_ci, b_idx), pcol)
            pval = jnp.where(inb, aval * jnp.take(blk_v, b_idx), pval)
            if k + 1 < d:
                blk_rp = jax.lax.ppermute(blk_rp, axis, perm)
                blk_ci = jax.lax.ppermute(blk_ci, axis, perm)
                blk_v = jax.lax.ppermute(blk_v, axis, perm)

        prow = jnp.where(pvalid, arow, m).astype(INDEX_DTYPE)
        pcol = jnp.where(pvalid, pcol, ncols).astype(INDEX_DTYPE)
        pval = jnp.where(pvalid, pval, 0.0).astype(QVALUE_DTYPE)
        prow, pcol, pval, pvalid2, flags, seg, nnzc = esc_sort(
            prow, pcol, pval, m
        )
        seg = jnp.where(pvalid2, seg, out_cap)
        cval = jnp.zeros((out_cap,), QVALUE_DTYPE).at[seg].add(
            pval, mode="drop"
        )
        crow = jnp.full((out_cap,), m, INDEX_DTYPE).at[seg].min(
            prow, mode="drop"
        )
        ccol = jnp.full((out_cap,), ncols, INDEX_DTYPE).at[seg].min(
            pcol, mode="drop"
        )
        row_ptr = jnp.searchsorted(
            crow, jnp.arange(m + 1, dtype=INDEX_DTYPE)
        ).astype(INDEX_DTYPE)
        return (
            row_ptr[None],
            ccol[None],
            cval[None],
            total[None],
            nnzc[None],
        )

    spec = P(axis)
    c_rp, c_ci, c_v, flops, nnzc = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(spec,) * 6,
        out_specs=(spec,) * 5,
        check_vma=False,
    )(a.row_ptr, a.col_ind, a.values, b.row_ptr, b.col_ind, b.values)
    c = ShardedCSR(c_rp, c_ci, c_v, ncols, a.global_rows)
    return c, {"flops": flops, "nnz": nnzc}
