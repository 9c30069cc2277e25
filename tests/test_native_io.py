"""Native C++ loader vs the pure-Python readers (differential oracle)."""

import numpy as np
import pytest

from sparse_matrix_with_flops_tpu.io import load_coo
from sparse_matrix_with_flops_tpu.io.native import (
    coo_to_csr_native,
    get_lib,
    read_graph_native,
)
from sparse_matrix_with_flops_tpu.io.snap import read_snap

FIXTURES = [
    ("tests/tdatas/tdata.snap", True),
    ("tests/tdatas/tdata.snap", False),
    ("tests/tdatas/t2.snap", True),
    ("tests/tdatas/test.mtx", False),
    ("tests/tdatas/sym.mtx", True),
    ("tests/tdatas/sym.mtx", False),
]

needs_native = pytest.mark.skipif(
    get_lib() is None, reason="native loader unavailable (no toolchain)"
)


@needs_native
@pytest.mark.parametrize("path,trans", FIXTURES)
def test_native_matches_python(path, trans):
    r1, c1, v1, nr1, nc1 = read_graph_native(path, trans)
    r2, c2, v2, nr2, nc2 = read_snap(path, is_trans=trans)
    assert (nr1, nc1) == (nr2, nc2)
    k1 = np.lexsort((c1, r1))
    k2 = np.lexsort((c2, r2))
    np.testing.assert_array_equal(r1[k1], r2[k2])
    np.testing.assert_array_equal(c1[k1], c2[k2])
    np.testing.assert_allclose(v1[k1], v2[k2])


@needs_native
def test_native_coo_to_csr_dedups():
    rp, c, v = coo_to_csr_native(
        np.array([1, 0, 1, 0], np.int32),
        np.array([1, 1, 1, 0], np.int32),
        np.array([1.0, 2.0, 3.0, 4.0], np.float32),
        2,
    )
    assert rp.tolist() == [0, 2, 3]
    assert c.tolist() == [0, 1, 1]
    assert v.tolist() == [4.0, 2.0, 4.0]


@needs_native
def test_load_coo_native_equals_python():
    a = load_coo("tests/tdatas/tdata.snap", use_native=True)
    b = load_coo("tests/tdatas/tdata.snap", use_native=False)
    sa = a.sum_duplicates().to_csr()
    sb = b.sum_duplicates().to_csr()
    assert bool(sa.is_equal(sb))


def test_spgemm_mt_baseline_matches_scipy():
    """The OpenMP Gustavson baseline (bench.py's vs_baseline_mt yardstick)
    must produce the exact scipy nnz(C) — it is a timing baseline, so its
    work must be the real work."""
    import scipy.sparse as sp

    from sparse_matrix_with_flops_tpu.io.native import spgemm_mt_baseline

    rng = np.random.default_rng(3)
    n = 512
    m = sp.random(
        n, n, density=0.02, format="csr", random_state=rng, dtype=np.float32
    )
    res = spgemm_mt_baseline(m.indptr, m.indices, m.data, n, iters=2)
    if res is None:
        pytest.skip("native toolchain unavailable")
    ms, nnzc = res
    assert nnzc == (m @ m).nnz
    assert ms > 0.0
