"""Distributed R-MCL: the flagship multi-chip training/iteration step.

Each iteration computes Mt' = prune(inflate(Mgt · Mt)) with

* Mgt (the regularisation matrix) row-sharded and static across iterations,
* Mt (the iterate) row-sharded; each step all-gathers it over ICI so every
  chip can read the B rows its A entries touch, then runs the fused local
  ESC SpGEMM + inflate/threshold/prune/normalize on its own rows only.
  Pruning is row-local (threshold depends only on the row, util.cc:4-69),
  so the only collectives are the iterate all-gather and a psum for the
  convergence norm — exactly the comm lower bound for row-partitioned
  Gustavson.

The iterate never leaves the devices across iterations (lax.scan carries
the sharded pytree), the multi-chip generalisation of the reference's
device-resident GPU loop (gpuRmclIter, gpu_csr_kernel.cu:281-311).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..config import INDEX_DTYPE, QVALUE_DTYPE
from ..formats.csr import CSR
from ..ops.prune import inflate_prune_normalize_stream
from ..ops.spgemm import bview_from_blocks, esc_expand_view, esc_sort
from .mesh import ROW_AXIS
from .sharded import ShardedCSR


def _local_fused_step(a_rp, a_ci, a_v, bv, ncols, product_cap, c_cap, mt_cap):
    """Fused local ESC SpGEMM + inflate/prune/normalize on this shard's rows
    (the distributed body of rmcl_one_step; see models/rmcl.py)."""
    a = CSR(a_rp, a_ci, a_v, bv.rows)
    m = a.rows
    prow, pcol, pval, flops = esc_expand_view(a, bv, product_cap)
    prow, pcol, pval, pvalid, flags, seg, nnzc = esc_sort(prow, pcol, pval, m)
    seg = jnp.where(pvalid, seg, c_cap)
    cval = jnp.zeros((c_cap,), QVALUE_DTYPE).at[seg].add(pval, mode="drop")
    crow = jnp.full((c_cap,), m, INDEX_DTYPE).at[seg].min(prow, mode="drop")
    ccol = jnp.full((c_cap,), ncols, INDEX_DTYPE).at[seg].min(pcol, mode="drop")
    cvalid = crow < m
    row_ptr, col, val, overflow = inflate_prune_normalize_stream(
        crow, ccol, cval, cvalid, m, ncols, mt_cap
    )
    info = {
        "flops": flops,
        "nnz_c": nnzc,
        "nnz_mt": row_ptr[-1],
        "overflow": (flops > product_cap) | (nnzc > c_cap) | overflow,
    }
    return row_ptr, col, val, info


@partial(
    jax.jit,
    static_argnames=("mesh", "product_cap", "c_cap", "axis", "track_differs"),
)
def sharded_rmcl_step(
    mesh,
    mgt: ShardedCSR,
    mt: ShardedCSR,
    product_cap: int,
    c_cap: int,
    axis: str = ROW_AXIS,
    track_differs: bool = True,
):
    """One distributed R-MCL iteration; caps are per-shard."""
    ncols = mt.ncols
    mt_cap = mt.local_capacity

    def kernel(a_rp, a_ci, a_v, b_rp, b_ci, b_v):
        g_rp = jax.lax.all_gather(b_rp[0], axis)
        g_ci = jax.lax.all_gather(b_ci[0], axis)
        g_v = jax.lax.all_gather(b_v[0], axis)
        bv = bview_from_blocks(g_rp, g_ci, g_v, ncols)
        n_rp, n_ci, n_v, info = _local_fused_step(
            a_rp[0], a_ci[0], a_v[0], bv, ncols, product_cap, c_cap, mt_cap
        )
        # convergence drift: psum of local squared norms (CSR::differs role)
        if track_differs:
            old = CSR(b_rp[0], b_ci[0], b_v[0], ncols)
            new = CSR(n_rp, n_ci, n_v, ncols)
            from ..ops.metrics import csr_frobenius_diff

            d2, n2 = csr_frobenius_diff(old, new)
            d2 = jax.lax.psum(d2, axis)
            n2 = jax.lax.psum(n2, axis)
            differs = jnp.sqrt(d2) / jnp.maximum(jnp.sqrt(n2), 1e-30)
        else:
            differs = jnp.asarray(0.0, QVALUE_DTYPE)
        stats = {
            "flops": jax.lax.psum(info["flops"], axis),
            "nnz_mt": jax.lax.psum(info["nnz_mt"], axis),
            "overflow": jax.lax.psum(info["overflow"].astype(jnp.int32), axis) > 0,
            "differs": differs,
        }
        return n_rp[None], n_ci[None], n_v[None], stats

    spec = P(axis)
    rep = P()
    stats_spec = {
        "flops": rep,
        "nnz_mt": rep,
        "overflow": rep,
        "differs": rep,
    }
    n_rp, n_ci, n_v, stats = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(spec,) * 6,
        out_specs=((spec,) * 3 + (stats_spec,)),
        check_vma=False,
    )(mgt.row_ptr, mgt.col_ind, mgt.values, mt.row_ptr, mt.col_ind, mt.values)
    new_mt = ShardedCSR(n_rp, n_ci, n_v, ncols, mt.global_rows)
    return new_mt, stats


@partial(
    jax.jit,
    static_argnames=(
        "mesh",
        "product_cap",
        "c_cap",
        "max_iters",
        "axis",
        "track_differs",
    ),
)
def sharded_rmcl_scan(
    mesh,
    mgt: ShardedCSR,
    mt: ShardedCSR,
    product_cap: int,
    c_cap: int,
    max_iters: int,
    axis: str = ROW_AXIS,
    track_differs: bool = True,
):
    """Device-resident multi-chip iteration loop (lax.scan over the sharded
    step) — the full distributed 'training step' of the framework."""

    def step(carry, _):
        new_mt, stats = sharded_rmcl_step(
            mesh, mgt, carry, product_cap, c_cap, axis, track_differs
        )
        return new_mt, stats

    return jax.lax.scan(step, mt, None, length=max_iters)


def plan_shard_capacities(
    mgt: ShardedCSR, mt_global_flops: int, margin: float = 1.5
) -> tuple[int, int]:
    """Per-shard capacity planning: balanced shards need ~total/D products
    with headroom for imbalance + nnz growth."""
    d = mgt.num_shards
    per = int(np.ceil(mt_global_flops / d * margin))
    per = max(per, 16)
    return per, per
