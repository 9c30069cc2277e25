"""R-MCL per-iteration wall clock on the attached device.

Usage: python tools/bench_rmcl.py [scale] [edge_factor] [S] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from sparse_matrix_with_flops_tpu.formats.csr import CSR
from sparse_matrix_with_flops_tpu.models.rmcl import rmcl_init
from sparse_matrix_with_flops_tpu.models.rmcl_ell import (
    _dense_huge,
    mt_to_ell,
    plan_rmcl_ell,
    rmcl_ell_scan,
)
from sparse_matrix_with_flops_tpu.utils.generate import rmat_csr


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    ef = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    print("backend:", jax.default_backend(), flush=True)

    g = rmat_csr(scale, edge_factor=ef, seed=7)
    # add self loops + normalise on host via the COO path
    import jax.numpy as jnp

    from sparse_matrix_with_flops_tpu.formats.coo import COO

    rp = np.asarray(g.row_ptr, np.int64)
    erow = np.repeat(np.arange(g.rows), np.diff(rp))
    coo = COO.from_numpy(
        erow,
        np.asarray(g.col_ind)[: int(rp[-1])],
        np.asarray(g.values)[: int(rp[-1])],
        g.rows,
        g.rows,
        capacity=int(rp[-1]) + g.rows,
    )
    mt0 = rmcl_init(coo)
    t0 = time.monotonic()
    plan = plan_rmcl_ell(mt0, S=S)
    print(
        f"plan {time.monotonic()-t0:.1f}s bins={[(d, len(r)) for d, r, _ in plan.bins]} "
        f"huge={plan.huge_rows.size}",
        flush=True,
    )
    cols, vals = mt_to_ell(mt0, S)
    a_d = _dense_huge(mt0, plan)

    t0 = time.monotonic()
    c1, v1, hist = rmcl_ell_scan(plan, mt0, a_d, cols, vals, iters)
    jax.block_until_ready(v1)
    compile_and_run = time.monotonic() - t0
    t0 = time.monotonic()
    c1, v1, hist = rmcl_ell_scan(plan, mt0, a_d, cols, vals, iters)
    jax.block_until_ready(v1)
    run = time.monotonic() - t0
    print(
        f"rmcl_ell scale {scale} S={S}: {run*1e3/iters:.2f} ms/iter "
        f"({iters} iters, compile+1st {compile_and_run:.0f}s) "
        f"nnz={np.asarray(hist['nnz'])} trunc={np.asarray(hist['truncated_rows'])} "
        f"differs={np.asarray(hist['differs']).round(4)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
