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


# HYB adaptive trigger (hybrid_omp_csr_kernel.cc:14): re-balance while the
# iterate still changes more than alpha per iteration.
REBALANCE_ALPHA = 0.008


def sharded_rmcl_adaptive(
    mt0: CSR,
    mesh,
    max_iters: int,
    alpha: float = REBALANCE_ALPHA,
    spread_threshold: float = 0.10,
    margin: float = 2.0,
    axis: str = ROW_AXIS,
):
    """Distributed R-MCL with flops-driven repartitioning BETWEEN
    iterations — the HYB adaptive strategy
    (hybrid_omp_csr_kernel.cc:14-34,67-74) lifted to the mesh.

    Each iteration the host re-estimates per-row flops of the NEXT
    multiply (row_flops is one gather+segment-sum); while the iterate is
    still changing (``differs > alpha``, the reference's trigger) and the
    current layout's per-shard flops spread exceeds
    ``spread_threshold``, rows are re-dealt with the flops-balanced snake
    permutation and both operands conjugately relabelled (P·M·Pᵗ keeps
    the iteration isomorphic), then re-sharded — the re-permute+reshard
    realisation of the blueprint's all_to_all repartition.  Once the
    iterate settles, the layout freezes (like HYB reusing ``ends[]``).

    This is the dynamic-mode driver: it pays one host round-trip per
    iteration (like models.rmcl mode="loop"); the static
    `rmcl_ell.sharded_rmcl_ell` keeps a fixed structure where one up-front
    balance suffices.  Returns (final CSR in the ORIGINAL labelling,
    history dict).
    """
    from ..ops.flops import row_flops
    from ..utils.perm import permutation_transpose
    from .sharded import flops_balanced_permutation, shard_csr, unshard_csr

    d = int(mesh.devices.size)
    n = mt0.rows
    lr = -(-n // d)
    mgt = mt0.deep_copy()
    mt = mt0

    def spread_of(rf: np.ndarray) -> float:
        padded = np.concatenate([rf, np.zeros(d * lr - n, rf.dtype)])
        per = padded.reshape(d, lr).sum(axis=1)
        return float((per.max() - per.min()) / max(per.mean(), 1.0))

    perm_total = np.arange(n, dtype=np.int32)
    prev_differs = np.inf
    hist = {
        "differs": [],
        "nnz": [],
        "spread_before": [],
        "spread_after": [],
        "rebalanced": [],
        "overflow": [],
    }
    for it in range(max_iters):
        rf = np.asarray(row_flops(mgt, mt), dtype=np.int64)
        sp0 = spread_of(rf)
        rebal = it == 0 or (
            prev_differs > alpha and sp0 > spread_threshold
        )
        if rebal:
            perm = flops_balanced_permutation(rf, d)
            pj = jnp.asarray(perm)
            mgt = mgt.conjugate_permute(pj)
            mt = mt.conjugate_permute(pj)
            perm_total = perm_total[perm]
            rf = rf[perm]
        hist["spread_before"].append(sp0)
        hist["spread_after"].append(spread_of(rf))
        hist["rebalanced"].append(bool(rebal))

        total = int(rf.sum())
        pc, cc = (
            max(16, int(np.ceil(total / d * margin))),
        ) * 2
        smgt = shard_csr(mgt, d)
        smt = shard_csr(mt, d, local_capacity=max(cc, int(mt.capacity)))
        new_smt, stats = sharded_rmcl_step(mesh, smgt, smt, pc, cc, axis)
        mt = unshard_csr(new_smt)
        prev_differs = float(stats["differs"])
        hist["differs"].append(prev_differs)
        hist["nnz"].append(int(stats["nnz_mt"]))
        hist["overflow"].append(bool(stats["overflow"]))

    inv = jnp.asarray(permutation_transpose(perm_total))
    out = mt.conjugate_permute(inv)
    return out, {k: np.asarray(v) for k, v in hist.items()}
