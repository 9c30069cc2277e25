"""Distributed static fused R-MCL: the flagship multi-chip loop.

The sharded counterpart of models/rmcl_ell.py.  Because the iterate is a
dense-shaped ELL pair ``[n, S]``, the per-iteration collective is a plain
`all_gather` of two dense arrays over ICI (no ragged protocol at all), and
every shard runs the same static fused step on its own Mgt row block:

* Mgt is row-sharded once (flops follow the fixed structure, so the
  flops-balanced permutation of `sharded.py` applies verbatim);
* per-shard degree-bin plans are UNIFIED to common shapes (max row count
  per class across shards, padded with -1) so one SPMD program serves all
  shards — the shard-varying content (row ids, entry ids, hub-row dense
  blocks) travels as sharded *data*, not as program constants;
* stats (nnz, truncation, convergence norm) are psum'd.

The scan keeps the sharded iterate device-resident across iterations —
gpuRmclIter (gpu_csr_kernel.cu:281-311) generalised to a mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..config import INDEX_DTYPE, QVALUE_DTYPE
from ..formats.csr import CSR
from ..models.rmcl_ell import (
    _dedup_tile,
    _ell_drift_sq,
    _hub_dense_products,
    _pow2ceil,
    _prune_select_lanes,
)
from .mesh import ROW_AXIS
from .sharded import ShardedCSR, shard_csr


@dataclasses.dataclass(frozen=True, eq=False)
class ShardedRmclPlan:
    n: int  # global (padded) rows = D * lr
    lr: int  # local rows per shard
    S: int
    bin_shapes: tuple  # ((D_class, R_pad), ...) common across shards
    hmax: int  # unified hub-row count per shard

    __hash__ = object.__hash__


def plan_sharded_rmcl_ell(
    mgt: CSR, num_shards: int, S: int = 128, max_tile: int = 8192
):
    """Shard Mgt + build unified per-shard degree-bin arrays.

    Returns (plan, arrays) where arrays is a dict of stacked [D, ...]
    device arrays (sharded over 'x' by the caller).
    """
    smgt = shard_csr(mgt, num_shards)
    lr = smgt.local_rows
    # largest pow2 degree class in budget (see models/rmcl_ell.plan_rmcl_ell)
    dmax = 1
    while dmax * 2 <= max(max_tile // S, 1):
        dmax *= 2

    per_shard = []
    classes = []
    d = 1
    while d <= dmax:
        classes.append(d)
        d *= 2
    hmaxs = []
    for sh in range(num_shards):
        rp = np.asarray(smgt.row_ptr[sh], dtype=np.int64)
        deg = np.diff(rp)
        shard_bins = {}
        for dc in classes:
            lo = dc // 2 + 1 if dc > 1 else 1
            sel = np.nonzero((deg >= lo) & (deg <= dc))[0]
            shard_bins[dc] = sel
        huge = np.nonzero(deg > dmax)[0]
        per_shard.append((rp, deg, shard_bins, huge))
        hmaxs.append(huge.size)
    hmax = max(max(hmaxs), 0)

    bin_shapes = []
    arrays = {"row_ids": [], "ent_src": []}
    for dc in classes:
        rmax = max(ps[2][dc].size for ps in per_shard)
        if rmax == 0:
            continue
        rpad = max(8, _pow2ceil(rmax))
        bin_shapes.append((dc, rpad))
        rid_stack = np.full((num_shards, rpad), -1, np.int32)
        src_stack = np.full((num_shards, rpad * dc), -1, np.int32)
        for sh, (rp, deg, shard_bins, _) in enumerate(per_shard):
            sel = shard_bins[dc]
            rid_stack[sh, : sel.size] = sel
            es = np.full((sel.size, dc), -1, np.int64)
            for k in range(dc):
                has = deg[sel] > k
                es[has, k] = rp[sel[has]] + k
            src_stack[sh, : sel.size * dc] = es.reshape(-1)
        arrays["row_ids"].append(jnp.asarray(rid_stack))
        arrays["ent_src"].append(jnp.asarray(src_stack))

    # unified hub rows: dense Mgt blocks [D, hmax, n]
    n_pad = smgt.padded_rows
    hrow_stack = np.full((num_shards, max(hmax, 1)), -1, np.int32)
    a_dense = np.zeros((num_shards, max(hmax, 1), n_pad), np.float32)
    for sh, (rp, deg, _, huge) in enumerate(per_shard):
        hrow_stack[sh, : huge.size] = huge
        col = np.asarray(smgt.col_ind[sh])
        val = np.asarray(smgt.values[sh])
        for hi, r in enumerate(huge):
            seg = slice(int(rp[r]), int(rp[r + 1]))
            np.add.at(a_dense[sh, hi], np.clip(col[seg], 0, n_pad - 1), val[seg])
    arrays["huge_rows"] = jnp.asarray(hrow_stack)
    arrays["a_dense"] = jnp.asarray(a_dense)

    plan = ShardedRmclPlan(
        n=n_pad,
        lr=lr,
        S=int(S),
        bin_shapes=tuple(bin_shapes),
        hmax=int(hmax),
    )
    return plan, arrays, smgt


def _local_step(plan, a_rp, a_ci, a_v, row_ids, ent_src, huge_rows, a_dense,
                g_cols, g_vals):
    """Fused step on one shard's rows against the gathered global iterate."""
    n, S, lr = plan.n, plan.S, plan.lr
    cap = a_ci.shape[0]
    safe_col = jnp.clip(a_ci, 0, n - 1)
    valid = jnp.arange(cap) < a_rp[-1]
    seg_c = jnp.where(valid[:, None], jnp.take(g_cols, safe_col, axis=0), n)
    seg_v = jnp.where(
        valid[:, None], jnp.take(g_vals, safe_col, axis=0) * a_v[:, None], 0.0
    )
    seg_c = jnp.concatenate([seg_c, jnp.full((1, S), n, INDEX_DTYPE)], axis=0)
    seg_v = jnp.concatenate([seg_v, jnp.zeros((1, S), QVALUE_DTYPE)], axis=0)
    sent = seg_c.shape[0] - 1

    new_cols = jnp.full((lr, S), n, INDEX_DTYPE)
    new_vals = jnp.zeros((lr, S), QVALUE_DTYPE)
    nnz_out = jnp.zeros((), INDEX_DTYPE)
    trunc = jnp.zeros((), INDEX_DTYPE)
    for (dc, rpad), rid, src in zip(plan.bin_shapes, row_ids, ent_src):
        s = jnp.where(src >= 0, src, sent)
        W = dc * S
        tc = jnp.take(seg_c, s, axis=0).reshape(rpad, W)
        tv = jnp.take(seg_v, s, axis=0).reshape(rpad, W)
        key2, uval = _dedup_tile(tc, tv, n)
        sc, sw, truncated = _prune_select_lanes(key2, uval, n, S)
        tgt = jnp.where(rid >= 0, rid, lr)
        new_cols = new_cols.at[tgt].set(sc, mode="drop")
        new_vals = new_vals.at[tgt].set(sw, mode="drop")
        ok = rid >= 0
        nnz_out = nnz_out + jnp.sum(jnp.where(ok[:, None], sc < n, False))
        trunc = trunc + jnp.sum(jnp.where(ok, truncated, False))

    if plan.hmax:
        c_h = _hub_dense_products(a_dense, g_cols, g_vals, n)
        lanes = jax.lax.broadcasted_iota(INDEX_DTYPE, c_h.shape, 1)
        key = jnp.where(c_h != 0, lanes, n)
        sc, sw, truncated = _prune_select_lanes(key, c_h, n, S)
        tgt = jnp.where(huge_rows >= 0, huge_rows, lr)
        new_cols = new_cols.at[tgt].set(sc, mode="drop")
        new_vals = new_vals.at[tgt].set(sw, mode="drop")
        ok = huge_rows >= 0
        nnz_out = nnz_out + jnp.sum(jnp.where(ok[:, None], sc < n, False))
        trunc = trunc + jnp.sum(jnp.where(ok, truncated, False))
    return new_cols, new_vals, nnz_out, trunc


@partial(jax.jit, static_argnames=("mesh", "plan", "axis", "max_iters"))
def sharded_rmcl_ell_scan(
    mesh,
    plan: ShardedRmclPlan,
    smgt: ShardedCSR,
    arrays,
    mt_cols,
    mt_vals,
    max_iters: int,
    axis: str = ROW_AXIS,
):
    """Device-resident multi-chip loop; ``mt_cols/vals`` are stacked
    [D, lr, S] (sharded over 'x')."""
    n, S, lr = plan.n, plan.S, plan.lr

    def kernel(a_rp, a_ci, a_v, row_ids, ent_src, huge_rows, a_dense, c0, v0):
        def step(carry, _):
            lc, lv = carry  # [1, lr, S] local shards
            g_c = jax.lax.all_gather(lc[0], axis).reshape(n, S)
            g_v = jax.lax.all_gather(lv[0], axis).reshape(n, S)
            nc, nv, nnz, trunc = _local_step(
                plan,
                a_rp[0],
                a_ci[0],
                a_v[0],
                [r[0] for r in row_ids],
                [s[0] for s in ent_src],
                huge_rows[0],
                a_dense[0],
                g_c,
                g_v,
            )
            # convergence: local diff via merged rows, psum'd
            ld2, ln2 = _ell_drift_sq(lc[0], lv[0], nc, nv, n)
            d2 = jax.lax.psum(ld2, axis)
            n2 = jax.lax.psum(ln2, axis)
            stats = {
                "nnz": jax.lax.psum(nnz, axis),
                "truncated_rows": jax.lax.psum(trunc, axis),
                "differs": jnp.sqrt(d2) / jnp.maximum(jnp.sqrt(n2), 1e-30),
            }
            return (nc[None], nv[None]), stats

        (fc, fv), hist = jax.lax.scan(step, (c0, v0), None, length=max_iters)
        return fc, fv, hist

    spec = P(axis)
    rep = P()
    stats_spec = {"nnz": rep, "truncated_rows": rep, "differs": rep}
    fc, fv, hist = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(
            (spec,) * 3
            + ([spec] * len(arrays["row_ids"]),)
            + ([spec] * len(arrays["ent_src"]),)
            + (spec, spec, spec, spec)
        ),
        out_specs=(spec, spec, stats_spec),
        check_vma=False,
    )(
        smgt.row_ptr,
        smgt.col_ind,
        smgt.values,
        arrays["row_ids"],
        arrays["ent_src"],
        arrays["huge_rows"],
        arrays["a_dense"],
        mt_cols,
        mt_vals,
    )
    return fc, fv, hist


def sharded_rmcl_ell(
    graph,
    mesh,
    max_iters: int = 5,
    S: int = 128,
    max_tile: int = 8192,
    axis: str = ROW_AXIS,
    balance: bool = False,
):
    """End-to-end distributed static R-MCL.  Returns (CSR, stats).

    ``balance=True`` relabels the graph with the flops-balanced snake
    permutation (arrayEqualPartition's static-shape descendant,
    sharded.py) so every shard carries near-equal first-iteration flops;
    the result is relabelled back before returning.
    """
    from ..formats.coo import COO
    from ..models.rmcl import rmcl_init
    from ..models.rmcl_ell import ell_to_csr, mt_to_ell

    mt0 = rmcl_init(graph) if isinstance(graph, COO) else graph
    num_shards = mesh.devices.size
    inv_perm = None
    if balance:
        from ..ops.flops import row_flops
        from .sharded import flops_balanced_permutation

        rf = np.asarray(row_flops(mt0, mt0))
        perm = flops_balanced_permutation(rf, num_shards)
        inv_perm = np.zeros_like(perm)
        inv_perm[perm] = np.arange(perm.size, dtype=perm.dtype)
        # conjugate relabel (P M Pt): rows AND cols, so the iteration is
        # isomorphic and shards get near-equal flops
        mt0 = mt0.conjugate_permute(jnp.asarray(perm))
    plan, arrays, smgt = plan_sharded_rmcl_ell(
        mt0, num_shards, S=S, max_tile=max_tile
    )
    cols, vals = mt_to_ell(mt0, S)
    # remap the ELL sentinel (ncols) to the padded global sentinel (n)
    cols = jnp.where(cols >= mt0.ncols, plan.n, cols)
    # pad the iterate to the sharded row count and stack per shard
    pad = plan.n - mt0.rows
    if pad:
        cols = jnp.concatenate(
            [cols, jnp.full((pad, S), plan.n, INDEX_DTYPE)], axis=0
        )
        vals = jnp.concatenate([vals, jnp.zeros((pad, S))], axis=0)
    mt_cols = cols.reshape(num_shards, plan.lr, S)
    mt_vals = vals.reshape(num_shards, plan.lr, S)
    fc, fv, hist = sharded_rmcl_ell_scan(
        mesh, plan, smgt, arrays, mt_cols, mt_vals, max_iters, axis
    )
    out = ell_to_csr(
        np.asarray(fc).reshape(plan.n, S)[: mt0.rows],
        np.asarray(fv).reshape(plan.n, S)[: mt0.rows],
        mt0.ncols,
    )
    if inv_perm is not None:
        out = out.conjugate_permute(jnp.asarray(inv_perm))
    return out, {k: np.asarray(v) for k, v in hist.items()}
