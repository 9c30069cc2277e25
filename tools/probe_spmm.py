"""Slope-timed BCSR SpMM rates on the real chip (ROOFLINE row).

Compares the Pallas scalar-prefetch kernel, the XLA gather+einsum
formulation, and the dense-matmul upper bound at a FEM-band shape.

Usage: python tools/probe_spmm.py [n] [ncols_b]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sparse_matrix_with_flops_tpu.formats.bcsr import BCSR
    from sparse_matrix_with_flops_tpu.formats.csr import CSR
    from sparse_matrix_with_flops_tpu.ops.spmm import bcsr_spmm, bcsr_spmm_xla
    from sparse_matrix_with_flops_tpu.utils.generate import banded_csr
    from sparse_matrix_with_flops_tpu.utils.timing import slope_bench

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    a = banded_csr(n, bandwidth=32)
    ab = BCSR.from_csr(a, br=8, bc=128)
    rng = np.random.default_rng(0)
    bmat = jnp.asarray(rng.random((n, nb)).astype(np.float32))
    nnz_blocks = int(np.asarray(ab.block_row_ptr)[-1])
    flops = 2.0 * nnz_blocks * ab.br * ab.bc * nb
    print(
        f"backend={jax.default_backend()} n={n} nb={nb} "
        f"blocks={nnz_blocks} dense-block flops={flops/1e9:.2f} G",
        flush=True,
    )

    ms = slope_bench(lambda x: bcsr_spmm(ab, bmat + x, kernel='pallas'))
    print(f"bcsr_spmm (Pallas):  {ms:8.2f} ms = {flops/ms/1e9:7.1f} GFLOP/s", flush=True)
    ms = slope_bench(lambda x: bcsr_spmm_xla(ab, bmat + x))
    print(f"bcsr_spmm_xla:       {ms:8.2f} ms = {flops/ms/1e9:7.1f} GFLOP/s", flush=True)
    # dense bound operand built ON DEVICE (a host constant this size
    # exceeds the tunnel's request-body limit)
    rp = jnp.asarray(a.row_ptr)
    ci = jnp.asarray(a.col_ind)
    vv = jnp.asarray(a.values)
    nnz = int(np.asarray(a.row_ptr)[-1])
    erow = jnp.repeat(jnp.arange(n), jnp.diff(rp), total_repeat_length=ci.shape[0])
    ad = jnp.zeros((n, n), jnp.float32).at[erow[:nnz], jnp.clip(ci[:nnz], 0, n - 1)].set(vv[:nnz])
    ad = jax.block_until_ready(ad)
    dflops = 2.0 * n * n * nb
    ms = slope_bench(lambda x: jnp.dot(ad, bmat + x, preferred_element_type=jnp.float32))
    print(f"dense matmul bound:  {ms:8.2f} ms = {dflops/ms/1e9:7.1f} GFLOP/s (dense accounting)", flush=True)


if __name__ == "__main__":
    main()
