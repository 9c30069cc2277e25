"""IO tests: SNAP header-format reader and MatrixMarket reader semantics."""

import numpy as np

from sparse_matrix_with_flops_tpu.io import load_coo, read_matrix_market, read_snap
from sparse_matrix_with_flops_tpu.io.matrix_market import write_matrix_market

TDATA = "tests/tdatas/tdata.snap"
T2 = "tests/tdatas/t2.snap"
MTX = "tests/tdatas/test.mtx"
SYM = "tests/tdatas/sym.mtx"


def test_read_snap_header_and_transpose():
    row, col, val, nrows, ncols = read_snap(TDATA, is_trans=True)
    assert (nrows, ncols) == (6, 6)
    assert row.shape[0] == 8
    # first edge 0->0; second 1->0 stored transposed as (0, 1)
    assert (row[1], col[1]) == (0, 1)
    assert np.all(val == 1.0)


def test_read_snap_no_transpose():
    row, col, val, _, _ = read_snap(TDATA, is_trans=False)
    assert (row[1], col[1]) == (1, 0)


def test_read_snap_t2():
    row, col, val, nrows, ncols = read_snap(T2, is_trans=False)
    assert (nrows, ncols) == (3, 3)
    assert row.shape[0] == 4


def test_read_mtx_via_snap_banner():
    # The reference routes .mtx through readSNAPFile, honouring the banner
    # (1-based indices).
    row, col, val, nrows, ncols = read_snap(MTX, is_trans=False)
    assert (nrows, ncols) == (4, 4)
    assert row.shape[0] == 6
    assert (row[0], col[0]) == (0, 1)
    np.testing.assert_allclose(val[0], -0.5)


def test_read_mtx_symmetric_mirrors():
    row, col, val, nrows, ncols = read_snap(SYM, is_trans=False)
    assert (nrows, ncols) == (3, 3)
    # 4 entries, 2 off-diagonal -> 6 after mirroring
    assert row.shape[0] == 6


def test_matrix_market_reader_matches_snap():
    r1, c1, v1, m, n = read_matrix_market(MTX)
    r2, c2, v2, _, _ = read_snap(MTX, is_trans=False)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(v1, v2)


def test_matrix_market_roundtrip(tmp_path):
    r, c, v, m, n = read_matrix_market(MTX)
    p = str(tmp_path / "rt.mtx")
    write_matrix_market(p, r, c, v, m, n)
    r2, c2, v2, m2, n2 = read_matrix_market(p)
    assert (m, n) == (m2, n2)
    np.testing.assert_array_equal(r, r2)
    np.testing.assert_allclose(v, v2, rtol=1e-6)


def test_load_coo_device(tmp_path):
    coo = load_coo(TDATA, is_trans=True, extra_capacity=6)
    assert coo.nrows == 6
    assert int(coo.nnz) == 8
    assert coo.capacity == 14
    withloops = coo.add_self_loops()
    d = np.asarray(withloops.to_dense())
    assert np.all(np.diag(d) > 0)
