"""TPU compile + numeric smoke for every production Pallas kernel.

The pallas_esc lesson (docs/ROUND2_NOTES.md §4b): interpret-mode green is
NOT evidence — a kernel can pass every CPU test and be rejected by Mosaic
at real shapes.  This script compiles AND executes each production Pallas
kernel on the attached TPU at production block shapes, checks the result
against a jnp reference, and prints one PASS/FAIL line per kernel.  Run
it after any kernel change and commit the log (docs/TPU_SMOKE.log) —
VERDICT r2 #6: no production Pallas path without a recorded TPU compile.

Usage: python tools/tpu_smoke.py   (needs the TPU; ~2-4 min of compiles)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

# repo-root import (PYTHONPATH breaks the axon plugin registration)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _check(name, got, want, tol=1e-5):
    got = np.asarray(got, dtype=np.float64)
    want = np.asarray(want, dtype=np.float64)
    err = float(np.max(np.abs(got - want) / np.maximum(np.abs(want), 1.0)))
    ok = err <= tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: max rel err {err:.2e}")
    return ok


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        print("tpu_smoke: WARNING — running on CPU; this log is NOT TPU evidence")
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(7)
    ok = True
    t0 = time.monotonic()

    # --- sort_dedup_compact: the per-bin ESC engine --------------------
    # production shapes: every s14 bin width up to MAX_W, presorted=CHUNK
    from sparse_matrix_with_flops_tpu.ops.pallas_sort import (
        align_windows,
        compact_nonzero_rows,
        sort_dedup_compact,
    )

    # W=32768 is a measured BOUNDARY, not a failure: the kernel's scoped
    # VMEM hits 18.16M > 16M at the minimum 8 rows/step (2026-08-19) —
    # the widest compilable sort class is 16384
    for w, r in [(64, 512), (512, 64), (8192, 16), (16384, 16), (32768, 8)]:
        chunk = min(64, w)
        ncols = 16384
        # alternating sorted runs of length `chunk` (the presorted
        # invariant the production gather sets up), sentinel-padded
        tc = rng.integers(0, ncols, size=(r, w)).astype(np.int32)
        tc = np.sort(tc.reshape(r, w // chunk, chunk), axis=2)
        tc[:, 1::2, :] = tc[:, 1::2, ::-1]
        tc = tc.reshape(r, w)
        tv = rng.random((r, w)).astype(np.float32)
        try:
            key, val = sort_dedup_compact(
                jnp.asarray(tc), jnp.asarray(tv), ncols, presorted=chunk
            )
            key, val = np.asarray(key), np.asarray(val)
        except Exception as e:
            if w >= 32768 and "vmem" in str(e).lower():
                print(
                    f"BOUNDARY sort_dedup_compact W={w}: scoped VMEM "
                    "limit (expected; widest compilable class is 16384)"
                )
                continue
            raise
        # reference: per-row sort + dedup-sum
        wsum = 0.0
        gsum = 0.0
        for i in range(r):
            import collections

            acc = collections.defaultdict(float)
            for c, v in zip(tc[i], tv[i]):
                acc[int(c)] += float(v)
            cols = sorted(k for k in acc if k < ncols)
            wsum += sum(acc[c] for c in cols) + sum(cols)
            live = key[i] < ncols
            gsum += float(val[i][live].sum()) + float(key[i][live].sum())
        ok &= _check(f"sort_dedup_compact W={w} R={r}", gsum, wsum, 1e-4)

    # --- compact_nonzero_rows: hub-row compaction ----------------------
    # 65536/131072 are the s16/s17 hub widths: they need the raised
    # scoped-VMEM limit (~26/52 MB), so a Mosaic rejection on a
    # smaller-VMEM TPU generation must show up HERE, not in production
    # (ADVICE r4 #1); the except guard records it as a BOUNDARY like the
    # wide sort classes
    for ncp, ncols in [(16384, 16384), (32768, 20000),
                       (65536, 65536), (131072, 131000)]:
        dense = np.zeros((16, ncp), np.float32)
        for i in range(16):
            cols = rng.choice(ncols, size=200, replace=False)
            dense[i, cols] = rng.random(200).astype(np.float32) + 0.1
        try:
            key, val = compact_nonzero_rows(jnp.asarray(dense), ncols)
        except Exception as e:
            if ncp >= 65536:
                print(
                    f"BOUNDARY compact_nonzero_rows ncp={ncp}: scoped "
                    f"VMEM past this generation's budget "
                    f"({type(e).__name__}); hub rows this wide fall "
                    "back to the XLA lane sort"
                )
                continue
            raise
        key, val = np.asarray(key), np.asarray(val)
        good = True
        for i in range(16):
            nz = np.nonzero(dense[i, :ncols])[0]
            live = key[i] < ncols
            good &= np.array_equal(key[i][live], nz)
            good &= np.allclose(val[i][live], dense[i, nz])
        print(f"{'PASS' if good else 'FAIL'} compact_nonzero_rows ncp={ncp}")
        ok &= good

    # --- align_windows: assembly window alignment ----------------------
    W = 128
    q = 8192  # s14-scale window count
    g = rng.integers(0, 1 << 20, size=(q, 4 * W)).astype(np.int32)
    off = rng.integers(0, W, size=(q, 1)).astype(np.int32)
    ac, av = align_windows(jnp.asarray(g), jnp.asarray(off))
    ac, av = np.asarray(ac), np.asarray(av)
    gc = np.concatenate([g[:, :W], g[:, 2 * W : 3 * W]], axis=1)
    gv = np.concatenate([g[:, W : 2 * W], g[:, 3 * W :]], axis=1)
    want_c = np.stack([gc[i, off[i, 0] : off[i, 0] + W] for i in range(q)])
    want_v = np.stack([gv[i, off[i, 0] : off[i, 0] + W] for i in range(q)])
    good = np.array_equal(ac, want_c) and np.array_equal(av, want_v)
    print(f"{'PASS' if good else 'FAIL'} align_windows Q={q} W={W}")
    ok &= good

    # --- cumsum_i32: single-pass prefix sum ----------------------------
    from sparse_matrix_with_flops_tpu.ops.pallas_scan import cumsum_i32

    x = rng.integers(0, 1000, size=16384).astype(np.int32)
    got = np.asarray(cumsum_i32(jnp.asarray(x)))
    good = np.array_equal(got, np.cumsum(x))
    print(f"{'PASS' if good else 'FAIL'} cumsum_i32 n=16384")
    ok &= good

    # --- bcsr_spmm: scalar-prefetch blocked SpMM ------------------------
    from sparse_matrix_with_flops_tpu.formats.bcsr import BCSR
    from sparse_matrix_with_flops_tpu.formats.csr import CSR
    from sparse_matrix_with_flops_tpu.ops.spmm import bcsr_spmm, bcsr_spmm_xla

    dense_a = np.zeros((1024, 1024), np.float32)
    for i in range(1024):
        cols = rng.choice(1024, size=24, replace=False)
        dense_a[i, cols] = rng.random(24).astype(np.float32)
    a_bcsr = BCSR.from_csr(CSR.from_dense(dense_a), br=8, bc=128)
    bmat = rng.random((1024, 256)).astype(np.float32)
    got = bcsr_spmm(a_bcsr, jnp.asarray(bmat))
    want = dense_a @ bmat
    # TPU default matmul precision feeds the MXU bf16-class inputs
    # (~2.7e-3 rel err vs the f32 host product — measured 2026-08-19);
    # the value-level check is vs host at that tolerance, plus an exact
    # cross-check between the Pallas and XLA formulations.
    ok &= _check("bcsr_spmm 1024x1024x256 (br=8,bc=128)", got, want, 5e-3)
    ok &= _check(
        "bcsr_spmm_xla (same operands)",
        bcsr_spmm_xla(a_bcsr, jnp.asarray(bmat)),
        want,
        5e-3,
    )
    ok &= _check(
        "bcsr_spmm pallas == xla",
        got,
        bcsr_spmm_xla(a_bcsr, jnp.asarray(bmat)),
        1e-6,
    )

    # --- ring_matmul: fused RDMA ring + MXU contraction -----------------
    # One physical chip, so d=1: compiles and runs the kernel BODY on
    # Mosaic (VMEM rotation scratch, DMA semaphore decls, in-kernel MXU
    # dot, axis_index) — the multi-hop RDMA schedule itself is pinned
    # against lax.all_gather on the virtual mesh
    # (tests/test_pallas_ring.py::test_ring_matmul_fused...).
    from jax import shard_map
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P

    from sparse_matrix_with_flops_tpu.parallel.pallas_ring import ring_matmul

    mesh1 = Mesh(np.array(jax.devices()[:1]), ("x",))
    m_r, lr_r, s_r = 256, 128, 256
    a_r = rng.normal(size=(m_r, lr_r)).astype(np.float32)
    b_r = rng.normal(size=(lr_r, s_r)).astype(np.float32)
    got = shard_map(
        lambda a_, b_: ring_matmul(a_, b_, "x", 1),
        mesh=mesh1,
        in_specs=(P(), P()),
        out_specs=P(),
        check_vma=False,
    )(jnp.asarray(a_r), jnp.asarray(b_r))
    ok &= _check(
        "ring_matmul d=1 256x128x256 (fused-ring kernel body on-chip)",
        got,
        a_r @ b_r,
        5e-3,
    )

    # --- ring_matmul_tiled: the N-gridded production variant ------------
    from sparse_matrix_with_flops_tpu.parallel.pallas_ring import (
        ring_matmul_tiled,
    )

    n_t = 1024  # 2 tiles at nt=512
    b_t = rng.normal(size=(lr_r, n_t)).astype(np.float32)
    got_t = shard_map(
        lambda a_, b_: ring_matmul_tiled(a_, b_, "x", 1, nt=512),
        mesh=mesh1,
        in_specs=(P(), P()),
        out_specs=P(),
        check_vma=False,
    )(jnp.asarray(a_r), jnp.asarray(b_t))
    ok &= _check(
        "ring_matmul_tiled d=1 256x128x1024 nt=512 (N-grid + scratch)",
        got_t,
        a_r @ b_t,
        5e-3,
    )

    print(
        f"tpu_smoke: {'ALL PASS' if ok else 'FAILURES'} "
        f"in {time.monotonic() - t0:.0f}s on {jax.default_backend()}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
