import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from sparse_matrix_with_flops_tpu.utils.generate import banded_csr
from sparse_matrix_with_flops_tpu.ops import block_spgemm as B
from sparse_matrix_with_flops_tpu.config import INDEX_DTYPE
from sparse_matrix_with_flops_tpu.utils.timing import slope_bench

a = banded_csr(62451, bandwidth=32)
plan = B.plan_block(a, a)
da = jax.device_put(a)
bs, m, n = plan.bs, plan.m, plan.n
pa = jnp.asarray(plan.pair_a); pb = jnp.asarray(plan.pair_b); pc = jnp.asarray(plan.pair_c)
bob = jnp.asarray(plan.bob); safe_bob = jnp.clip(bob, 0, plan.n_cblk - 1)
W = plan.kmax * bs; mbr = plan.bob.shape[0]
colblk = jnp.asarray(plan.bob_colblk)
lane = jnp.arange(bs, dtype=INDEX_DTYPE)
gcol = (colblk[:, :, None].astype(INDEX_DTYPE) * bs + lane[None, None, :]).reshape(mbr, W)
gcol = jnp.where((colblk[:, :, None] >= 0).repeat(bs, axis=2).reshape(mbr, W), gcol, n)

def upto(stage):
    def step(x):
        av = da.values[: plan.nnz_a] + x
        ab = B._densify(plan.a_blk, plan.a_r, plan.a_c, av, plan.n_ablk, bs)
        astr = B._densify(plan.a_blk, plan.a_r, plan.a_c, jnp.ones_like(av), plan.n_ablk, bs)
        def pm(xa, xb):
            return jax.lax.dot_general(jnp.take(xa, pa, axis=0), jnp.take(xb, pb, axis=0),
                (((2,), (1,)), ((0,), (0,))), precision=jax.lax.Precision.HIGHEST)
        pv = pm(ab, ab); ps = pm(astr, astr)
        if stage == "pairs": return (pv, ps)
        cv = jax.ops.segment_sum(pv, pc, num_segments=plan.n_cblk, indices_are_sorted=True)
        cs = jax.ops.segment_sum(ps, pc, num_segments=plan.n_cblk, indices_are_sorted=True)
        if stage == "seg": return (cv, cs)
        def rows_of(b4):
            g = jnp.take(b4, safe_bob, axis=0)
            return g.transpose(0, 2, 1, 3).reshape(mbr * bs, W)
        vr = rows_of(cv); sr = rows_of(cs)
        if stage == "rows": return (vr, sr)
        gcr = jnp.repeat(gcol, bs, axis=0)
        keys = jnp.where((sr > 0) & (gcr < n), gcr, n).astype(INDEX_DTYPE)
        if stage == "keys": return (keys, vr)
        k2, v2 = jax.lax.sort((keys, vr), dimension=1, num_keys=1)
        k2, v2 = k2[:m], v2[:m]
        counts = jnp.sum(k2 < n, axis=1).astype(INDEX_DTYPE)
        v2 = jnp.where(k2 < n, v2, 0.0)
        if stage == "sort": return (k2, v2, counts)
        raise ValueError(stage)
    return step

prev = 0.0
for st in ["pairs", "seg", "rows", "keys", "sort"]:
    t = slope_bench(upto(st))
    print(f"{st:6s} cumulative {t:8.2f} ms   delta {t - prev:8.2f} ms")
    prev = t
