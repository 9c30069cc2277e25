"""SpGEMM tests: ESC pipeline vs dense oracle (the reference's differential
oracle pattern: SEQ vs backend, omp_spmm_test.cc:8-54)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_with_flops_tpu.formats import CSR
from sparse_matrix_with_flops_tpu.io import load_coo
from sparse_matrix_with_flops_tpu.ops.flops import (
    classify_flops,
    flops_bin_id,
    log2_histogram,
    row_flops,
    spgemm_flops,
)
from sparse_matrix_with_flops_tpu.ops.spgemm import (
    matmul,
    spgemm,
    spgemm_dense_oracle,
    spgemm_symbolic,
    spgemm_upper_bounds,
)


def rand_sparse(rng, rows, cols, density):
    d = rng.standard_normal((rows, cols)).astype(np.float32)
    d[rng.random((rows, cols)) >= density] = 0.0
    return d


class TestSpGEMM:
    def test_tiny_identity(self):
        a = CSR.from_dense(np.eye(4, dtype=np.float32))
        c = matmul(a, a)
        assert bool(c.is_raw_equal(a))

    def test_small_vs_oracle(self, rng):
        da = rand_sparse(rng, 17, 23, 0.2)
        db = rand_sparse(rng, 23, 11, 0.25)
        a, b = CSR.from_dense(da), CSR.from_dense(db)
        c = matmul(a, b)
        oracle = spgemm_dense_oracle(a, b)
        assert bool(c.make_ordered().is_raw_equal(oracle, tol=1e-5))
        np.testing.assert_allclose(
            np.asarray(c.to_dense()), da @ db, rtol=1e-5, atol=1e-5
        )

    def test_padded_inputs(self, rng):
        da = rand_sparse(rng, 9, 9, 0.3)
        a = CSR.from_dense(da).with_capacity(64)
        c = matmul(a, a)
        np.testing.assert_allclose(
            np.asarray(c.to_dense()), da @ da, rtol=1e-5, atol=1e-5
        )

    def test_excess_capacity(self, rng):
        """product_cap/out_cap larger than needed must not change results."""
        da = rand_sparse(rng, 8, 8, 0.4)
        a = CSR.from_dense(da)
        pc, oc = spgemm_upper_bounds(a, a)
        c1 = spgemm(a, a, pc, oc)
        c2 = spgemm(a, a, pc * 2 + 5, oc * 3 + 7)
        assert bool(c1.is_equal(c2.with_capacity(c1.capacity) if c2.capacity != c1.capacity else c2)) or bool(
            c1.is_raw_equal(c2)
        )

    def test_empty_matrix(self):
        a = CSR.from_arrays([0, 0, 0], [], [], 2, capacity=1)
        c = spgemm(a, a, 1, 1)
        assert int(c.nnz) == 0

    def test_zero_rows_in_a(self, rng):
        da = rand_sparse(rng, 10, 10, 0.3)
        da[3] = 0
        da[7] = 0
        a = CSR.from_dense(da)
        c = matmul(a, a)
        np.testing.assert_allclose(
            np.asarray(c.to_dense()), da @ da, rtol=1e-5, atol=1e-5
        )
        assert np.asarray(c.row_counts())[3] == 0

    def test_duplicate_accumulation(self):
        # two paths to the same output cell must sum
        da = np.asarray([[1.0, 2.0], [0.0, 0.0]], np.float32)
        db = np.asarray([[3.0, 0.0], [4.0, 0.0]], np.float32)
        a, b = CSR.from_dense(da), CSR.from_dense(db)
        c = matmul(a, b)
        assert int(c.nnz) == 1
        np.testing.assert_allclose(np.asarray(c.to_dense())[0, 0], 11.0)

    def test_symbolic_matches_numeric(self, rng):
        da = rand_sparse(rng, 20, 20, 0.2)
        a = CSR.from_dense(da)
        pc, oc = spgemm_upper_bounds(a, a)
        row_ptr, nnzc, flops = spgemm_symbolic(a, a, pc)
        c = spgemm(a, a, pc, oc)
        np.testing.assert_array_equal(np.asarray(row_ptr), np.asarray(c.row_ptr))
        assert int(nnzc) == int(c.nnz)
        assert int(flops) == pc

    def test_snap_end_to_end(self):
        """The S0+S1 minimum slice: C = A·A on tests/tdatas/tdata.snap."""
        coo = load_coo("tests/tdatas/tdata.snap", is_trans=True, extra_capacity=6)
        a = coo.add_self_loops().make_ordered().to_csr()
        c = matmul(a, a)
        d = np.asarray(a.to_dense())
        np.testing.assert_allclose(np.asarray(c.to_dense()), d @ d, rtol=1e-6)

    def test_rectangular_chain(self, rng):
        da = rand_sparse(rng, 7, 31, 0.3)
        db = rand_sparse(rng, 31, 5, 0.3)
        c = matmul(CSR.from_dense(da), CSR.from_dense(db))
        np.testing.assert_allclose(
            np.asarray(c.to_dense()), da @ db, rtol=1e-5, atol=1e-5
        )


class TestFlops:
    def test_row_flops_matches_definition(self, rng):
        da = rand_sparse(rng, 12, 12, 0.3)
        a = CSR.from_dense(da)
        rf = np.asarray(row_flops(a, a))
        pa = (da != 0)
        expected = (pa @ pa.sum(axis=1)).astype(np.int64)
        np.testing.assert_array_equal(rf, expected)

    def test_total_flops(self, rng):
        da = rand_sparse(rng, 15, 15, 0.25)
        a = CSR.from_dense(da)
        _, total = spgemm_flops(a, a)
        pc, _ = spgemm_upper_bounds(a, a)
        assert int(total) == pc

    def test_bin_ids(self):
        f = jnp.asarray([0, 1, 2, 4, 5, 16, 17, 64, 65, 512, 513, 100000])
        ids = np.asarray(flops_bin_id(f))
        np.testing.assert_array_equal(ids, [1, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7])

    def test_classify_flops_ordering(self, rng):
        da = rand_sparse(rng, 30, 30, 0.2)
        a = CSR.from_dense(da)
        binning = classify_flops(a, a)
        sf = np.asarray(binning.sorted_flops)
        assert np.all(np.diff(sf) >= 0)
        rf = np.asarray(row_flops(a, a))
        np.testing.assert_array_equal(np.sort(rf), sf)
        starts = np.asarray(binning.bin_starts)
        assert starts[0] == 0 and starts[-1] == 30
        assert np.all(np.diff(starts) >= 0)

    def test_log2_histogram(self):
        h = np.asarray(log2_histogram(jnp.asarray([0, 1, 2, 3, 4, 8, 9])))
        # buckets: 0/1 -> b0; 2 -> b1; 3,4 -> b2; 8 -> b3; 9 -> b4
        assert h[0] == 2 and h[1] == 1 and h[2] == 2 and h[3] == 1 and h[4] == 1
