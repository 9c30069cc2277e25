"""2-D (rows x column-stripes) sharded SpGEMM vs single-chip oracle."""

import numpy as np
import jax
import pytest

from sparse_matrix_with_flops_tpu.formats.csr import CSR
from sparse_matrix_with_flops_tpu.ops.spgemm import matmul, spgemm_upper_bounds
from sparse_matrix_with_flops_tpu.parallel import shard_csr
from sparse_matrix_with_flops_tpu.parallel.spgemm2d import (
    shard_csr_2d,
    sharded_spgemm_2d,
    unshard_2d,
)

from conftest import random_csr_np


def _random_csr(rng, rows, cols, density):
    rp, c, v = random_csr_np(rng, rows, cols, density)
    return CSR.from_arrays(rp, c, v, ncols=cols)


@pytest.mark.parametrize("nx,ny", [(2, 4), (4, 2)])
def test_spgemm_2d_matches_single_chip(rng, nx, ny):
    mesh = jax.make_mesh((nx, ny), ("x", "y"))
    a = _random_csr(rng, 48, 48, 0.15)
    b = _random_csr(rng, 48, 40, 0.2)
    ref = matmul(a, b).make_ordered()

    flops, _ = spgemm_upper_bounds(a, b)
    per = max(flops, 16)
    sa = shard_csr(a, nx)
    b_rp, b_ci, b_v, stripe, b_rows = shard_csr_2d(b, nx, ny)
    c_rp, c_ci, c_v = sharded_spgemm_2d(
        mesh, sa, b_rp, b_ci, b_v, stripe, b_rows, per, per
    )
    got = unshard_2d(c_rp, c_ci, c_v, stripe, a.rows, b.ncols)
    want = ref._drop_explicit_zeros()
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(want, tol=1e-5)
    )
