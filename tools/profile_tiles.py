"""Tiles-phase sub-profiling: b_ells build vs gathers vs sort-dedup."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import sparse_matrix_with_flops_tpu.ops.ell_esc as E
from sparse_matrix_with_flops_tpu.ops.pallas_sort import sort_dedup_compact
from sparse_matrix_with_flops_tpu.utils.generate import rmat_csr
from sparse_matrix_with_flops_tpu.utils.timing import bench_fn
from functools import partial

scale = int(sys.argv[1]) if len(sys.argv) > 1 else 14
a = rmat_csr(scale, edge_factor=8, seed=7, weights="random")
plan = E.plan_ell(a, a)
da = jax.device_put(a)
print("backend:", jax.default_backend(), flush=True)

# b_ells + chunk view only
@partial(jax.jit, static_argnames=("plan",))
def bells_only(a, b, plan):
    ncols = plan.ncols
    outs = []
    for S, b_rows in plan.b_classes:
        rows_s = jnp.asarray(b_rows)
        ok = (rows_s >= 0)[:, None]
        safe_rows = jnp.clip(rows_s, 0, b.rows - 1)
        start = jnp.take(b.row_ptr, safe_rows)[:, None]
        cnt = jnp.where(ok, (jnp.take(b.row_ptr, safe_rows + 1)[:, None] - start), 0)
        lanes = jnp.arange(S, dtype=jnp.int32)[None, :]
        idx = jnp.clip(start + lanes, 0, b.capacity - 1)
        valid = lanes < cnt
        ec = jnp.where(valid, jnp.take(b.col_ind, idx), ncols)
        ev = jnp.where(valid, jnp.take(b.values, idx), 0.0)
        outs.append((ec.sum(), ev.sum()))
    return outs

ms = bench_fn(lambda x: bells_only(x, x, plan), da, warmup=1, iters=3)
print(f"b_ells build: {ms:.1f} ms", flush=True)

# gathers only (no sort)
@partial(jax.jit, static_argnames=("plan", "chunk"))
def gathers_only(a, b, plan, chunk):
    ncols = plan.ncols
    b_ells = []
    for S, b_rows in plan.b_classes:
        rows_s = jnp.asarray(b_rows)
        ok = (rows_s >= 0)[:, None]
        safe_rows = jnp.clip(rows_s, 0, b.rows - 1)
        start = jnp.take(b.row_ptr, safe_rows)[:, None]
        cnt = jnp.where(ok, (jnp.take(b.row_ptr, safe_rows + 1)[:, None] - start), 0)
        lanes = jnp.arange(S, dtype=jnp.int32)[None, :]
        idx = jnp.clip(start + lanes, 0, b.capacity - 1)
        valid = lanes < cnt
        ec = jnp.where(valid, jnp.take(b.col_ind, idx), ncols)
        ev = jnp.where(valid, jnp.take(b.values, idx), 0.0)
        ec = jnp.concatenate([ec, jnp.full((1, S), ncols, jnp.int32)], axis=0)
        ev = jnp.concatenate([ev, jnp.zeros((1, S))], axis=0)
        b_ells.append((ec, ev))
    prod_c = jnp.concatenate([ec.reshape(-1, chunk) for ec, _ in b_ells], axis=0)
    prod_v = jnp.concatenate([ev.reshape(-1, chunk) for _, ev in b_ells], axis=0)
    acc = []
    for bi, (W, row_ids, tile_src, tile_ent) in enumerate(plan.bins):
        src = jnp.asarray(tile_src)
        aval = jnp.take(a.values, jnp.asarray(tile_ent))[:, None]
        tc = jnp.take(prod_c, src, axis=0).reshape(-1, W)
        tv = (jnp.take(prod_v, src, axis=0) * aval).reshape(-1, W)
        acc.append(tc.sum() + tv.sum().astype(jnp.int32))
    return acc

ms = bench_fn(lambda x: gathers_only(x, x, plan, E.CHUNK), da, warmup=1, iters=3)
print(f"b_ells + tile gathers: {ms:.1f} ms", flush=True)

# pallas sort alone on the biggest bin shape
W, row_ids, tile_src, _ = max(plan.bins, key=lambda b: len(b[2]))
R = len(tile_src) // (W // E.CHUNK)
Rp = -(-R // 8) * 8
rng = np.random.default_rng(0)
tc = jnp.asarray(rng.integers(0, plan.ncols + 1, size=(Rp, W)).astype(np.int32))
tv = jnp.asarray(rng.random((Rp, W)).astype(np.float32))
ms = bench_fn(lambda c, v: sort_dedup_compact(c, v, plan.ncols), tc, tv, warmup=1, iters=3)
print(f"pallas sdc biggest bin ({Rp}x{W} = {Rp*W/1e6:.1f}M lanes): {ms:.1f} ms", flush=True)

# full tiles for reference
ms = bench_fn(lambda x: E._tiles_impl(x, x, plan, E.CHUNK, True), da, warmup=1, iters=3)
print(f"full tiles (pallas): {ms:.1f} ms", flush=True)
