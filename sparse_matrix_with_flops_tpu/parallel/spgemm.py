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
from ..ops.segments import exclusive_cumsum
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
