"""Per-bin differential checker + bin diagnostics (VERDICT r1 item 7).

The key property: a corruption seeded into exactly one flops bin's rows
is localised by ``results_comparison`` to that bin (the reference's
isPartialRawEqual/resultsComparison role, mindex2-cuda/nGpuSpMM.cc:85-240).
"""

import numpy as np

import jax.numpy as jnp

from sparse_matrix_with_flops_tpu.formats.coo import COO
from sparse_matrix_with_flops_tpu.formats.csr import CSR
from sparse_matrix_with_flops_tpu.ops.bincheck import (
    classify_flops_queues,
    filter_rows,
    is_partial_raw_equal,
    per_bin_b_row_histogram,
    results_comparison,
)
from sparse_matrix_with_flops_tpu.ops.spgemm import matmul

from conftest import random_csr_np


def _random_csr(rng, rows, cols, density):
    rp, c, v = random_csr_np(rng, rows, cols, density)
    return CSR.from_arrays(rp, c, v, ncols=cols)


def test_classify_queues_reference_semantics(rng):
    a = _random_csr(rng, 60, 60, 0.1)
    hqueue, hv = classify_flops_queues(a, a)
    rp = np.asarray(a.row_ptr, dtype=np.int64)
    acount = np.diff(rp)
    bcounts = np.diff(rp)
    acol = np.asarray(a.col_ind)[: int(rp[-1])]
    rf = np.zeros(a.rows, dtype=np.int64)
    np.add.at(rf, np.repeat(np.arange(a.rows), acount), bcounts[acol])
    # every row with flops appears exactly once
    assert sorted(hqueue.tolist()) == sorted(np.nonzero(rf > 0)[0].tolist())
    # single-entry rows land in queue 0
    q0 = set(hqueue[hv[0] : hv[1]].tolist())
    for r in np.nonzero((acount == 1) & (rf > 0))[0]:
        assert int(r) in q0
    # queue monotonicity: flops of queue q rows bounded by 2^(q-1)
    for q in range(2, 20):
        ids = hqueue[hv[q] : hv[q + 1]]
        for r in ids:
            assert rf[r] <= (1 << (q - 1))
            assert rf[r] > (1 << max(q - 2, 0)) or acount[r] >= 128 or q == 2


def test_identical_outputs_pass(rng):
    a = _random_csr(rng, 50, 50, 0.15)
    c = matmul(a, a).make_ordered()
    rep = results_comparison(c, c, a, a)
    assert rep["ok"]
    assert rep["failing_bins"] == []
    assert rep["bins"]  # at least one nonempty bin was actually checked


def test_seeded_single_bin_corruption_is_localised(rng):
    """Corrupt one row from one specific bin; exactly that bin fails."""
    a = _random_csr(rng, 64, 64, 0.15)
    c = matmul(a, a).make_ordered()
    hqueue, hv = classify_flops_queues(a, a)
    # pick the most populated queue with q >= 2
    counts = np.diff(hv)
    target_q = int(np.argmax(counts[2:]) + 2)
    victim = int(hqueue[hv[target_q]])
    rp = np.asarray(c.row_ptr)
    col = np.asarray(c.col_ind).copy()
    val = np.asarray(c.values).copy()
    s, e = int(rp[victim]), int(rp[victim + 1])
    assert e > s
    val[s] *= 1.5  # 50% relative error: far beyond the 1e-3 tolerance
    bad = CSR.from_arrays(rp, col, val, c.ncols)
    rep = results_comparison(bad, c, a, a)
    assert not rep["ok"]
    assert rep["failing_bins"] == [target_q]
    # and the clean bins all passed
    for q, info in rep["bins"].items():
        if q != target_q:
            assert info["hc_vs_rc"] and info["rc_vs_hc"]


def test_partial_raw_equal_ignores_tiny_values(rng):
    """|value| <= 1e-8 entries are raw-equal noise (reference eps)."""
    rp = np.array([0, 2], np.int32)
    c1 = CSR.from_arrays(rp, np.array([0, 1]), np.array([1.0, 1e-9], np.float32), 4)
    c2 = CSR.from_arrays(
        np.array([0, 1], np.int32), np.array([0]), np.array([1.0], np.float32), 4
    )
    ok, n = is_partial_raw_equal(c1, c2, np.array([0]))
    assert ok and n == 0
    ok, n = is_partial_raw_equal(c2, c1, np.array([0]))
    assert ok and n == 0


def test_per_bin_b_row_histogram_totals(rng):
    a = _random_csr(rng, 60, 60, 0.1)
    hist = per_bin_b_row_histogram(a, a)
    hqueue, hv = classify_flops_queues(a, a)
    rp = np.asarray(a.row_ptr, dtype=np.int64)
    acount = np.diff(rp)
    # total histogram mass == number of A elements in binned rows whose
    # B row is nonempty
    bcounts = np.diff(rp)
    acol = np.asarray(a.col_ind)[: int(rp[-1])]
    erow = np.repeat(np.arange(a.rows), acount)
    in_bin = np.zeros(a.rows, bool)
    in_bin[hqueue] = True
    want = int((in_bin[erow] & (bcounts[acol] > 0)).sum())
    assert int(hist.sum()) == want


def test_filter_rows_reference_fixture():
    """The exact gutted fixture of mat_dat_analysis.cc:124-140, evaluated
    per the filter_rows algorithm (:53-106)."""
    a = COO.from_numpy(
        np.array([0, 0, 1, 2, 2, 3, 3], np.int32),
        np.array([1, 4, 2, 0, 5, 1, 3], np.int32),
        np.array([2.0, 6.0, 3.0, 4.0, 7.0, 1.0, 5.0], np.float32),
        nrows=4,
        ncols=6,
    ).to_csr()
    b = COO.from_numpy(
        np.array([1, 1, 3, 3, 3, 4, 4, 5, 5], np.int32),
        np.array([2, 4, 1, 3, 4, 2, 4, 0, 2], np.int32),
        np.array([2.0, 4.0, 5.0, 1.0, 3.0, 6.0, 7.0, 8.0, 9.0], np.float32),
        nrows=6,
        ncols=5,
    ).to_csr()
    # limit=2 keeps A rows 0,2,3 (row 1 has nnz=1): touch counts per B
    # row {0:1, 1:2, 3:1, 4:1, 5:1}; B row sizes {0,2,0,3,2,2};
    # bins by size <=0,<=1,<=2,<=3,>3 -> [1, 0, 2+1+1, 1, 0]
    bins = filter_rows(2, a, b, [0, 1, 2, 3])
    assert bins == [1, 0, 4, 1, 0]
    # limit=3: no A row has nnz >= 3 -> all-zero bins
    bins3 = filter_rows(3, a, b, [0, 1, 2, 3])
    assert bins3 == [0, 0, 0, 0, 0]
