"""Pallas tile-ESC SpGEMM vs oracles (interpret mode on CPU)."""

import numpy as np
import pytest

from sparse_matrix_with_flops_tpu.formats.csr import CSR
from sparse_matrix_with_flops_tpu.ops.pallas_esc import plan_tiles, spgemm_tiles
from sparse_matrix_with_flops_tpu.ops.spgemm import (
    matmul,
    spgemm_dense_oracle,
)
from sparse_matrix_with_flops_tpu.utils.generate import banded_csr, rmat_csr

from conftest import random_csr_np


def _random_csr(rng, rows, cols, density):
    rp, c, v = random_csr_np(rng, rows, cols, density)
    return CSR.from_arrays(rp, c, v, ncols=cols)


@pytest.mark.parametrize("density", [0.05, 0.25])
def test_tiles_match_oracle_random(rng, density):
    a = _random_csr(rng, 40, 48, density)
    b = _random_csr(rng, 48, 40, density)
    plan = plan_tiles(a, b, widths=(8, 32))
    got = spgemm_tiles(a, b, plan, interpret=True)
    want = spgemm_dense_oracle(a, b)
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )


def test_tiles_huge_fallback(rng):
    dense = (rng.random((32, 32)) < 0.08).astype(np.float32)
    dense[5, :] = 1.0
    dense *= rng.random((32, 32)).astype(np.float32) + 0.5
    a = CSR.from_dense(dense)
    plan = plan_tiles(a, a, widths=(8,))
    assert plan.huge_rows.size >= 1
    got = spgemm_tiles(a, a, plan, interpret=True)
    want = spgemm_dense_oracle(a, a)
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )


def test_tiles_rmat():
    a = rmat_csr(6, edge_factor=4, seed=9, weights="random")
    plan = plan_tiles(a, a, widths=(16, 64))
    got = spgemm_tiles(a, a, plan, interpret=True)
    want = matmul(a, a).make_ordered()
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )


def test_tiles_banded():
    a = banded_csr(48, bandwidth=3, seed=4)
    plan = plan_tiles(a, a, widths=(32,))
    got = spgemm_tiles(a, a, plan, interpret=True)
    want = matmul(a, a).make_ordered()
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )
