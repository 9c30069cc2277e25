"""Isolate the hub-row compaction cost (s14-shaped: 696 x 16384 dense
rows, ~35% nonzero like A@A hub rows).

Variants slope-timed on the same data:
  one-level   width-N Pallas shift compaction (round-2 committed path)
  blocks      width-128 block compaction only (no stitch)
  two-level   block compaction + roll/scatter-add stitch (uncommitted)
  xla-sort    lax.sort((key, val)) along the lane axis

Usage: python tools/probe_hub.py [rows] [ncols] [density]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sparse_matrix_with_flops_tpu.config import INDEX_DTYPE
    from sparse_matrix_with_flops_tpu.ops.ell_esc import _roll_sel
    from sparse_matrix_with_flops_tpu.ops.pallas_sort import (
        compact_nonzero_rows,
    )
    from sparse_matrix_with_flops_tpu.utils.timing import slope_bench

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 696
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    dens = float(sys.argv[3]) if len(sys.argv) > 3 else 0.35
    rng = np.random.default_rng(0)
    cd = rng.random((rows, N)).astype(np.float32)
    cd = np.where(rng.random((rows, N)) < dens, cd, 0.0)
    cd_dev = jax.device_put(jnp.asarray(cd))
    print(
        f"backend={jax.default_backend()} rows={rows} N={N} dens={dens}",
        flush=True,
    )
    interp = jax.default_backend() != "tpu"

    def one_level(x):
        c = cd_dev + x
        k, v = compact_nonzero_rows(c, N, interpret=interp)
        return jnp.sum(k) + jnp.sum(v)

    def blocks_only(x):
        c = (cd_dev + x).reshape(-1, 128)
        k, v = compact_nonzero_rows(
            c, 128, rows_per_step=512 if c.shape[0] % 512 == 0 else 8,
            interpret=interp,
        )
        return jnp.sum(k) + jnp.sum(v)

    def two_level(x):
        c_d = cd_dev + x
        hcp = c_d.shape[0]
        hc = hcp
        ncp = N
        nblk = ncp // 128
        nb = hcp * nblk
        rps = next(s for s in (512, 256, 64, 8) if nb % s == 0)
        k2, v2c = compact_nonzero_rows(
            c_d.reshape(nb, 128), 128, rows_per_step=rps, interpret=interp
        )
        bc = jnp.sum(k2 < 128, axis=1).astype(INDEX_DTYPE)
        ob = jnp.cumsum(bc.reshape(hcp, nblk), axis=1)
        rowcnt = ob[:, -1]
        of = (ob - bc.reshape(hcp, nblk)).reshape(-1)
        vb = jnp.arange(nb, dtype=INDEX_DTYPE)
        kk = jnp.where(k2 < 128, k2 + (vb % nblk)[:, None] * 128, N)
        t = of % 128
        qd = of // 128
        lane = jnp.arange(128, dtype=INDEX_DTYPE)[None, :]
        okb = lane < bc[:, None]
        rkk = _roll_sel(kk, t, 128, right=True)
        rvv = _roll_sel(v2c, t, 128, right=True)
        rmm = _roll_sel(okb.astype(jnp.int32), t, 128, right=True)
        m_a = (rmm > 0) & (lane >= t[:, None])
        m_b = (rmm > 0) & (lane < t[:, None])
        rowv = vb // nblk
        base = rowv * nblk
        ok_blk = (rowv < hc) & (bc > 0)
        ngrid = hc * nblk
        tgt_a = jnp.where(ok_blk, base + qd, ngrid)
        tgt_b = jnp.where(ok_blk & (t > 0), base + qd + 1, ngrid)
        acc_c = jnp.zeros((ngrid, 128), jnp.int32)
        acc_v = jnp.zeros((ngrid, 128), jnp.float32)
        acc_m = jnp.zeros((ngrid, 128), jnp.int32)
        acc_c = acc_c.at[tgt_a].add(jnp.where(m_a, rkk, 0), mode="drop")
        acc_c = acc_c.at[tgt_b].add(jnp.where(m_b, rkk, 0), mode="drop")
        acc_v = acc_v.at[tgt_a].add(jnp.where(m_a, rvv, 0.0), mode="drop")
        acc_v = acc_v.at[tgt_b].add(jnp.where(m_b, rvv, 0.0), mode="drop")
        acc_m = acc_m.at[tgt_a].add(m_a.astype(jnp.int32), mode="drop")
        acc_m = acc_m.at[tgt_b].add(m_b.astype(jnp.int32), mode="drop")
        live = acc_m > 0
        return (
            jnp.sum(jnp.where(live, acc_c, N))
            + jnp.sum(jnp.where(live, acc_v, 0.0))
            + jnp.sum(rowcnt)
        )

    def xla_sort(x):
        c_d = cd_dev + x
        lanes = jax.lax.broadcasted_iota(INDEX_DTYPE, c_d.shape, 1)
        key = jnp.where(c_d != 0, lanes, N)
        key, vals = jax.lax.sort((key, c_d), dimension=1, num_keys=1)
        return jnp.sum(key) + jnp.sum(vals)

    for name, fn in [
        ("one-level", one_level),
        ("blocks", blocks_only),
        ("two-level", two_level),
        ("xla-sort", xla_sort),
    ]:
        ms = slope_bench(fn, ks=(1, 5))
        print(f"{name:12s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
