"""Reference-scale R-MCL headline (VERDICT r4 #8): the static-ELL
clustering loop at s16 scale with slope-timed ms/iter, exact convergence
history, purity on a planted partition, and a CPU-loop comparison.

The CPU baseline is a faithful unfused R-MCL iteration in scipy:
Gustavson SpGEMM (csr @ csr) + v^2 inflation + the reference's
computeThreshold prune (a=0.90, b=2, floor 1e-7; util.cc:4-9) + row
renormalisation — the seqRmclIter shape (qrmcl.cc:86-124) on 2026 host
hardware.

Timing is SLOPE-based (ms/iter = (T(k2) - T(k1)) / (k2 - k1) with the
whole loop inside one jitted scan per k): block_until_ready is not a
sync point through the axon tunnel (docs/ROOFLINE.md), and the slope
cancels dispatch + fetch latency for the CPU loop too.

Usage: python tools/bench_rmcl_scale.py [n_clusters] [cluster_size]
         [S] [--out benchmarks/results_r5.jsonl]
Defaults 1024 x 64 = 65536 nodes (s16 scale).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cpu_rmcl_iters(sm, iters):
    """Unfused scipy R-MCL loop; returns (total_seconds, nnz history)."""
    import scipy.sparse as sp

    mg = sm.copy()
    m = sm.copy()
    nnz_hist = []
    t0 = time.monotonic()
    for _ in range(iters):
        m = (mg @ m).tocsr()
        m.sort_indices()
        # inflate v <- v^2 (arrayInflationR2, util.cc:41-45)
        m.data *= m.data
        # per-row threshold prune + renormalise (util.cc:4-69)
        rp = m.indptr
        cnt = np.diff(rp)
        sums = np.add.reduceat(
            np.concatenate([m.data, [0.0]]), np.minimum(rp[:-1], m.nnz)
        )
        sums = np.where(cnt > 0, sums, 0.0)
        # rows with cnt 0 -> reduceat picks garbage; mask handled above
        maxs = np.zeros(m.shape[0], m.data.dtype)
        np.maximum.at(
            maxs,
            np.repeat(np.arange(m.shape[0]), cnt),
            m.data if m.nnz else np.zeros(0, m.data.dtype),
        )
        avg = np.where(cnt > 0, sums / np.maximum(cnt, 1), 0.0)
        thr = np.clip(0.9 * avg * (1 - 2 * (maxs - avg)), 1e-7, None)
        thr = np.minimum(thr, np.where(cnt > 0, maxs, 1e-7))
        keep = m.data >= np.repeat(thr, cnt)
        rows_r = np.repeat(np.arange(m.shape[0]), cnt)[keep]
        data = m.data[keep]
        ksum = np.zeros(m.shape[0], np.float64)
        np.add.at(ksum, rows_r, data)
        data = data / np.maximum(ksum[rows_r], 1e-30)
        m = sp.csr_matrix(
            (data.astype(np.float32), m.indices[keep],
             np.concatenate([[0], np.cumsum(np.bincount(
                 rows_r, minlength=m.shape[0]))])),
            shape=m.shape,
        )
        nnz_hist.append(int(m.nnz))
    return time.monotonic() - t0, nnz_hist


def main():
    import jax

    from sparse_matrix_with_flops_tpu.models.clusters import extract_clusters
    from sparse_matrix_with_flops_tpu.models.rmcl import rmcl_init
    from sparse_matrix_with_flops_tpu.models.rmcl_ell import (
        _dense_huge,
        mt_to_ell,
        plan_rmcl_ell,
        rmcl_ell_scan,
    )
    from sparse_matrix_with_flops_tpu.utils.generate import (
        cluster_purity,
        planted_partition_coo,
    )
    from sparse_matrix_with_flops_tpu.utils.timing import (
        enable_compile_cache,
    )

    enable_compile_cache()
    argv = sys.argv[1:]
    out = None
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    kc = int(argv[0]) if len(argv) > 0 else 1024
    cs = int(argv[1]) if len(argv) > 1 else 64
    S = int(argv[2]) if len(argv) > 2 else 128
    n = kc * cs
    print(f"backend={jax.default_backend()} n={n} ({kc}x{cs}) S={S}",
          flush=True)

    # p_out scales as ~8/n: the generator's 0.002 default adds ~131
    # inter-cluster edges per node at n=65536 (mean degree 151 -> 63k
    # dense-path rows -> 16 GB operand); ~24 total degree matches the
    # power-law corpus scale
    coo, planted = planted_partition_coo(
        kc, cs, p_in=0.3, p_out=8.0 / (kc * cs), seed=11
    )
    mt0 = rmcl_init(coo)
    # materialize the init BEFORE timing the plan: rmcl_init is lazy and
    # its first host fetch (compile + run through the tunnel) otherwise
    # lands inside plan_ms (measured 100 s of phantom "planning")
    np.asarray(mt0.row_ptr), np.asarray(mt0.col_ind), np.asarray(mt0.values)
    t0 = time.monotonic()
    plan = plan_rmcl_ell(mt0, S=S)
    plan_s = time.monotonic() - t0
    print(f"plan {plan_s:.1f}s huge={plan.huge_rows.size}", flush=True)
    cols, vals = mt_to_ell(mt0, S)
    a_d = _dense_huge(mt0, plan)

    def run(iters):
        c1, v1, hist = rmcl_ell_scan(plan, mt0, a_d, cols, vals, iters)
        # fetching the stats forces the whole scan (tunnel-proof)
        d = np.asarray(hist["differs"])
        return c1, v1, hist, float(d[-1])

    ks = (2, 6)
    walls = {}
    for k in ks:
        run(k)  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.monotonic()
            run(k)
            ts.append(time.monotonic() - t0)
        ts.sort()
        walls[k] = ts[len(ts) // 2]
    ms_iter = (walls[ks[1]] - walls[ks[0]]) / (ks[1] - ks[0]) * 1e3

    # convergence + clustering quality from a longer run (12 iters left
    # ~65k near-singleton clusters at n=65536 — attractors need the
    # iterate to actually converge before extraction means anything)
    c1, v1, hist, _ = run(30)
    nnz_hist = [int(x) for x in np.asarray(hist["nnz"])]
    differs = [round(float(x), 5) for x in np.asarray(hist["differs"])]
    from sparse_matrix_with_flops_tpu.models.rmcl_ell import ell_to_csr

    mt_fin = ell_to_csr(np.asarray(c1), np.asarray(v1), mt0.ncols)
    # the converged fixed point spreads each row's mass over ~12
    # same-cluster attractor columns (~0.08 each) — a 0.2 floor sees
    # only singletons; 0.05 links within-cluster attractors
    labels = extract_clusters(mt_fin, weight_floor=0.05)
    purity = cluster_purity(np.asarray(labels), planted)

    # CPU loop baseline on the same init
    import scipy.sparse as sp

    rp = np.asarray(mt0.row_ptr)
    nnz0 = int(rp[-1])
    sm = sp.csr_matrix(
        (
            np.asarray(mt0.values)[:nnz0],
            np.asarray(mt0.col_ind)[:nnz0],
            rp,
        ),
        shape=mt0.shape,
    )
    cpu_s2, _ = cpu_rmcl_iters(sm, 2)
    cpu_s6, cpu_nnz = cpu_rmcl_iters(sm, 6)
    cpu_ms_iter = (cpu_s6 - cpu_s2) / 4 * 1e3

    rec = {
        "metric": "rmcl_planted_%dx%d" % (kc, cs),
        "kernel": "rmcl-static-ell",
        "rows": n,
        "annz": nnz0,
        "S": S,
        "ms_per_iter": round(ms_iter, 2),
        "plan_ms": round(plan_s * 1e3, 1),
        "nnz_hist": nnz_hist,
        "differs": differs,
        "clusters_found": int(np.unique(np.asarray(labels)).size),
        "purity": round(float(purity), 4),
        "cpu_ms_per_iter": round(cpu_ms_iter, 2),
        "vs_cpu_loop": round(cpu_ms_iter / ms_iter, 3),
        "cpu_nnz_hist": cpu_nnz,
        "platform": jax.default_backend(),
        "timing": "slope-over-iters",
    }
    line = json.dumps(rec)
    print(line, flush=True)
    if out:
        with open(out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
