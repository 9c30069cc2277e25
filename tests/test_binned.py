"""Binned SpGEMM vs the plain ESC pipeline and the dense oracle.

Keeps the reference's per-bin differential-check idea
(isPartialRawEqual/resultsComparison, nGpuSpM M.cc:85-240): every binned
configuration must match the un-binned result.
"""

import numpy as np
import pytest

from sparse_matrix_with_flops_tpu.formats.csr import CSR
from sparse_matrix_with_flops_tpu.ops.binned import (
    BinPlan,
    plan_bins,
    spgemm_binned,
)
from sparse_matrix_with_flops_tpu.ops.spgemm import matmul, spgemm_dense_oracle
from sparse_matrix_with_flops_tpu.utils.generate import banded_csr, rmat_csr

from conftest import random_csr_np


def _random_csr(rng, rows, cols, density):
    rp, c, v = random_csr_np(rng, rows, cols, density)
    return CSR.from_arrays(rp, c, v, ncols=cols)


@pytest.mark.parametrize("density", [0.05, 0.3])
def test_binned_matches_oracle_random(rng, density):
    a = _random_csr(rng, 40, 48, density)
    b = _random_csr(rng, 48, 32, density)
    plan = plan_bins(a, b, widths=(4, 16, 64))
    got = spgemm_binned(a, b, plan)
    want = spgemm_dense_oracle(a, b)
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-5
        )
    )


def test_binned_huge_row_path(rng):
    # one dense row -> lands in huge_rows, rest in small bins
    dense = (rng.random((32, 32)) < 0.1).astype(np.float32)
    dense[3, :] = 1.0  # heavy row
    dense *= rng.random((32, 32)).astype(np.float32) + 0.5
    a = CSR.from_dense(dense)
    plan = plan_bins(a, a, widths=(4, 16))
    assert plan.huge_rows.size >= 1
    got = spgemm_binned(a, a, plan)
    want = spgemm_dense_oracle(a, a)
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )


def test_binned_matches_esc_rmat():
    a = rmat_csr(7, edge_factor=6, seed=3, weights="random")
    plan = plan_bins(a, a)
    got = spgemm_binned(a, a, plan)
    want = matmul(a, a).make_ordered()
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )


def test_binned_banded():
    a = banded_csr(96, bandwidth=4, seed=1)
    plan = plan_bins(a, a, widths=(16, 64))
    got = spgemm_binned(a, a, plan)
    want = matmul(a, a).make_ordered()
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )


def test_plan_bins_covers_all_rows():
    a = rmat_csr(6, edge_factor=4, seed=5)
    plan = plan_bins(a, a)
    seen = np.concatenate(
        [ids[ids >= 0] for ids, _ in plan.bins]
        + [plan.huge_rows]
    )
    rf_pos = np.sum(np.asarray(a.row_counts()) > 0)
    # every row with nonzero flops appears exactly once
    assert seen.size == np.unique(seen).size
