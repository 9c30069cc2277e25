"""Decide ops/pallas_esc.py's fate (VERDICT r1 item 6).

Benchmarks spgemm_tiles (the VMEM-resident-B Pallas tile pipeline) on the
REAL chip against the production ELL-ESC path on the same small-B
workloads it was designed for (nnz(B) <= ~700k), slope-timed.  If it
wins, it becomes the small-B fast path; if not, the pipeline dies and
only the shared kernels (pallas_sort) stay.

Usage: python tools/bench_pallas_esc.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from sparse_matrix_with_flops_tpu.formats.csr import CSR
from sparse_matrix_with_flops_tpu.ops.ell_esc import (
    _tiles_impl,
    _use_pallas_default,
    plan_ell,
    spgemm_ell,
)
from sparse_matrix_with_flops_tpu.ops.pallas_esc import (
    _spgemm_tiles_impl,
    plan_tiles,
    spgemm_tiles,
)
from sparse_matrix_with_flops_tpu.ops.spgemm import spgemm_upper_bounds
from sparse_matrix_with_flops_tpu.utils.generate import banded_csr, rmat_csr
from sparse_matrix_with_flops_tpu.utils.timing import slope_bench


def main():
    print("backend:", jax.default_backend(), flush=True)
    cases = [
        ("rmat_s10_ef8", rmat_csr(10, edge_factor=8, seed=7, weights="random")),
        ("rmat_s12_ef8", rmat_csr(12, edge_factor=8, seed=7, weights="random")),
        ("banded_4k_b16", banded_csr(4096, bandwidth=16)),
    ]
    for name, a in cases:
        oflops, _ = spgemm_upper_bounds(a, a)
        flops2 = 2.0 * oflops
        da = jax.device_put(a)
        print(f"--- {name}: rows={a.rows} nnz={int(a.nnz)} oflops={oflops}")

        # production ELL-ESC fused
        try:
            plan = plan_ell(a, a)
            spgemm_ell(da, da, plan)
            spgemm_ell(da, da, plan)
            cap = getattr(plan, "_nnzc_cache")
            up = _use_pallas_default()

            def step(x):
                a2 = CSR(da.row_ptr, da.col_ind, da.values + x, da.ncols)
                csr, nz = _tiles_impl(
                    a2, da, plan, plan.chunk, up, fused_out_cap=cap
                )
                return (csr.row_ptr, csr.col_ind, csr.values, nz)

            ms = slope_bench(step)
            print(
                f"ell-esc fused   {ms:8.2f} ms  {flops2/ms/1e6:8.2f} GFLOPS",
                flush=True,
            )
        except Exception as e:
            print(f"ell-esc FAIL: {str(e).splitlines()[0][:140]}", flush=True)

        # pallas tile pipeline (VMEM-resident B)
        try:
            tplan = plan_tiles(a, a)

            def step2(x):
                a2 = CSR(da.row_ptr, da.col_ind, da.values + x, da.ncols)
                out = _spgemm_tiles_impl(a2, da, tplan, False)
                return tuple(jax.tree.leaves(out))

            ms = slope_bench(step2)
            print(
                f"pallas tiles    {ms:8.2f} ms  {flops2/ms/1e6:8.2f} GFLOPS",
                flush=True,
            )
        except Exception as e:
            print(f"pallas tiles FAIL: {str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
