"""Row-partitioned SpGEMM driver (ops/partitioned.py): the flat-CSR
export path for outputs past the single-dispatch memory scale.

Differential oracle: partitioned output must equal the monolithic
ELL-ESC pipeline's raw-for-raw (same stitch semantics as the reference's
per-thread PCSR concatenation, mvcsr.cc:124-226)."""

import numpy as np
import pytest

from sparse_matrix_with_flops_tpu.formats.csr import CSR
from sparse_matrix_with_flops_tpu.ops.ell_esc import plan_ell, spgemm_ell
from sparse_matrix_with_flops_tpu.ops.partitioned import (
    csr_row_slice,
    csr_vstack,
    flops_prefix_partition,
    spgemm_ell_partitioned,
)
from sparse_matrix_with_flops_tpu.utils.generate import rmat_csr


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _random_csr(rng, m, n, density):
    dense = rng.random((m, n)).astype(np.float32)
    dense = np.where(rng.random((m, n)) < density, dense, 0.0)
    return CSR.from_dense(dense)


def test_row_slice_vstack_roundtrip(rng):
    a = _random_csr(rng, 37, 19, 0.3)
    cuts = [0, 11, 12, 37]
    back = csr_vstack(
        [csr_row_slice(a, r0, r1) for r0, r1 in zip(cuts[:-1], cuts[1:])],
        a.ncols,
    )
    assert bool(a.is_raw_equal(back))


def test_flops_prefix_partition_balance():
    a = rmat_csr(9, edge_factor=8, seed=3, weights="random")
    cuts = flops_prefix_partition(a, a, 4)
    assert cuts[0] == 0 and cuts[-1] == a.rows
    rp = np.asarray(a.row_ptr)
    ci = np.asarray(a.col_ind)[: int(rp[-1])]
    bcnt = np.diff(rp)
    fl = bcnt[ci].astype(np.int64)
    pos = np.searchsorted(rp, np.arange(fl.size), side="right") - 1
    per_group = [
        int(fl[(pos >= r0) & (pos < r1)].sum())
        for r0, r1 in zip(cuts[:-1], cuts[1:])
    ]
    total = sum(per_group)
    # contiguous prefix cuts: every group within 2x of the ideal share
    assert max(per_group) <= 2 * total / len(per_group) + max(fl)


def test_partitioned_matches_monolithic(rng):
    a = rmat_csr(8, edge_factor=8, seed=5, weights="random")
    want = spgemm_ell(a, a, plan_ell(a, a))
    got = spgemm_ell_partitioned(a, a, parts=3)
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-5
        )
    )


def test_partitioned_rectangular(rng):
    a = _random_csr(rng, 60, 48, 0.15)
    b = _random_csr(rng, 48, 33, 0.2)
    want = spgemm_ell(a, b, plan_ell(a, b))
    got = spgemm_ell_partitioned(a, b, parts=4)
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-5
        )
    )
