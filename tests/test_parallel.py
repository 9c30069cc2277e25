"""Distributed layer tests on the 8-device virtual CPU mesh.

Oracle pattern (SURVEY.md §4): every sharded configuration must match the
single-chip run on the same matrix.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparse_matrix_with_flops_tpu.formats.csr import CSR
from sparse_matrix_with_flops_tpu.io import load_coo
from sparse_matrix_with_flops_tpu.models.rmcl import rmcl, rmcl_init
from sparse_matrix_with_flops_tpu.ops.flops import row_flops
from sparse_matrix_with_flops_tpu.ops.spgemm import matmul, spgemm_upper_bounds
from sparse_matrix_with_flops_tpu.parallel import (
    flops_balanced_permutation,
    make_mesh,
    plan_shard_capacities,
    shard_csr,
    sharded_rmcl_scan,
    sharded_rmcl_step,
    sharded_spgemm,
    unshard_csr,
)

from conftest import random_csr_np


def _random_csr(rng, rows, cols, density):
    rp, c, v = random_csr_np(rng, rows, cols, density)
    return CSR.from_arrays(rp, c, v, ncols=cols)


def test_shard_roundtrip(rng):
    a = _random_csr(rng, 37, 41, 0.15)
    s = shard_csr(a, 8)
    assert s.num_shards == 8
    assert s.padded_rows >= a.rows
    back = unshard_csr(s)
    assert bool(back.is_equal(a))


def test_shard_roundtrip_exact_multiple(rng):
    a = _random_csr(rng, 32, 16, 0.2)
    back = unshard_csr(shard_csr(a, 4))
    assert bool(back.is_equal(a))


@pytest.mark.parametrize("nd", [2, 8])
def test_sharded_spgemm_matches_single_chip(rng, nd):
    mesh = make_mesh(nd)
    a = _random_csr(rng, 48, 48, 0.15)
    b = _random_csr(rng, 48, 40, 0.2)
    ref = matmul(a, b).make_ordered()
    flops, _ = spgemm_upper_bounds(a, b)
    per = max(flops, 16)  # worst-case per-shard capacity
    sa = shard_csr(a, nd)
    sb = shard_csr(b, nd)
    c, info = sharded_spgemm(mesh, sa, sb, per, per)
    got = unshard_csr(c)._drop_explicit_zeros()
    want = ref._drop_explicit_zeros()
    assert bool(got.is_raw_equal(want, tol=1e-5))
    assert int(jnp.sum(info["flops"])) == flops


def test_flops_balanced_permutation_balances():
    rng = np.random.default_rng(1)
    flops = rng.integers(0, 1000, size=64)
    perm = flops_balanced_permutation(flops, 8)
    assert sorted(perm.tolist()) == list(range(64))
    per_shard = flops[perm].reshape(8, 8).sum(axis=1)
    assert per_shard.max() - per_shard.min() <= flops.max()


def test_sharded_rmcl_matches_single_chip(rng):
    mesh = make_mesh(8)
    graph = load_coo("tests/tdatas/tdata.snap", extra_capacity=16)
    mt0 = rmcl_init(graph)
    ref = rmcl(mt0, max_iters=3, mode="loop")

    flops, _ = spgemm_upper_bounds(mt0, mt0)
    smgt = shard_csr(mt0, 8, local_capacity=mt0.capacity)
    smt = shard_csr(mt0, 8, local_capacity=mt0.capacity)
    pc, cc = plan_shard_capacities(smgt, flops * 4, margin=8.0)
    mt, hist = sharded_rmcl_scan(mesh, smgt, smt, pc, cc, 3)
    got = unshard_csr(mt)
    want = ref.mt
    assert not bool(np.any(np.asarray(hist["overflow"])))
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-5
        )
    )
    # aggregated flops per iteration match the single-chip history
    np.testing.assert_array_equal(
        np.asarray(hist["flops"]), ref.flops_history
    )


def test_sharded_rmcl_step_reports_differs(rng):
    mesh = make_mesh(2)
    a = _random_csr(rng, 24, 24, 0.3).aver_and_norm_rows()
    sa = shard_csr(a, 2, local_capacity=a.capacity * 4)
    pc = 4096
    new_mt, stats = sharded_rmcl_step(mesh, sa, sa, pc, pc)
    assert float(stats["differs"]) > 0.0
    assert int(stats["nnz_mt"]) > 0


def test_sharded_spgemm_uneven_rows(rng):
    # rows not divisible by the mesh size (padding rows on the last shard)
    mesh = make_mesh(8)
    a = _random_csr(rng, 43, 43, 0.18)
    b = _random_csr(rng, 43, 37, 0.2)
    ref = matmul(a, b).make_ordered()
    flops, _ = spgemm_upper_bounds(a, b)
    per = max(flops, 16)
    c, info = sharded_spgemm(mesh, shard_csr(a, 8), shard_csr(b, 8), per, per)
    got = unshard_csr(c)._drop_explicit_zeros()
    assert bool(got.is_raw_equal(ref._drop_explicit_zeros(), tol=1e-5))


def test_sharded_rmcl_single_device_mesh(rng):
    # D=1 degenerate mesh must equal the single-chip path
    mesh = make_mesh(1)
    a = _random_csr(rng, 16, 16, 0.4).aver_and_norm_rows()
    sa = shard_csr(a, 1, local_capacity=a.capacity * 4)
    new_mt, stats = sharded_rmcl_step(mesh, sa, sa, 2048, 2048)
    assert int(stats["nnz_mt"]) > 0


@pytest.mark.parametrize("nd", [2, 4, 8])
def test_sharded_spgemm_ring_matches_single_chip(rng, nd):
    """Ring-rotated B exchange (ppermute) equals the all-gather path and
    the single-chip product — the memory-scalable distributed SpGEMM."""
    from sparse_matrix_with_flops_tpu.parallel import sharded_spgemm_ring

    mesh = make_mesh(nd)
    a = _random_csr(rng, 44, 52, 0.15)
    b = _random_csr(rng, 52, 36, 0.2)
    ref = matmul(a, b).make_ordered()
    flops, _ = spgemm_upper_bounds(a, b)
    per = max(flops, 16)
    sa = shard_csr(a, nd)
    sb = shard_csr(b, nd)
    c, info = sharded_spgemm_ring(mesh, sa, sb, per, per)
    got = unshard_csr(c)._drop_explicit_zeros()
    want = ref._drop_explicit_zeros()
    assert bool(got.is_raw_equal(want, tol=1e-5))
    assert int(jnp.sum(info["flops"])) == flops


def test_ring_per_chip_work_scales_with_devices(rng):
    """The planner-grouped ring (VERDICT r2 #3): per-chip compiled work
    must SHRINK as devices are added on a fixed global problem — the
    round-2 ring paid D full passes over the per-shard product stream, so
    its per-chip flops were ~constant in D.  Compare XLA's per-device
    flops estimate at D=2 vs D=4 vs D=8."""
    from sparse_matrix_with_flops_tpu.parallel import make_mesh, shard_csr
    from sparse_matrix_with_flops_tpu.parallel.spgemm import (
        _ring_impl,
        plan_spgemm_ring,
    )

    a = _random_csr(rng, 256, 256, 0.08)
    flops, _ = spgemm_upper_bounds(a, a)
    per = max(flops, 16)

    def per_chip_flops(nd):
        mesh = make_mesh(nd)
        sa = shard_csr(a, nd)
        plan, ents = plan_spgemm_ring(sa, sa)
        lowered = _ring_impl.lower(mesh, plan, sa, sa, ents, per, "x")
        cost = lowered.compile().cost_analysis()
        return float(cost["flops"])

    f2, f4, f8 = per_chip_flops(2), per_chip_flops(4), per_chip_flops(8)
    # 1/D scaling with planner padding slack: halving again must keep
    # shrinking (old design: f4 ~= f2)
    assert f4 < 0.75 * f2, (f2, f4)
    assert f8 < 0.75 * f4, (f4, f8)


def test_adaptive_repartition_balances_and_matches(rng):
    """HYB-style adaptive repartitioning (VERDICT r1 item 3): on a skewed
    matrix the per-shard flops spread stays under 10% across 5 iterations,
    and the relabel round-trip preserves the single-chip result."""
    from sparse_matrix_with_flops_tpu.parallel import sharded_rmcl_adaptive

    n, d = 128, 4
    # heavy first block (deg ~24) + light tail (deg ~4), heavy rows all in
    # shard 0 under the natural layout -> initial spread far above 10%
    dense = np.zeros((n, n), np.float32)
    for i in range(n):
        deg = 24 if i < 16 else 4
        cols = rng.choice(n, size=deg, replace=False)
        dense[i, cols] = 1.0
        dense[i, i] = 1.0
    mt0 = CSR.from_dense(dense).aver_and_norm_rows()

    mesh = make_mesh(d)
    ref = rmcl(mt0, max_iters=5, mode="loop")
    got, hist = sharded_rmcl_adaptive(mt0, mesh, max_iters=5)

    assert hist["rebalanced"][0]
    assert hist["spread_before"][0] > 0.10  # the skew was real
    assert np.all(hist["spread_after"] < 0.10)
    assert not np.any(hist["overflow"])
    a = got.make_ordered()._drop_explicit_zeros()
    b = ref.mt.make_ordered()._drop_explicit_zeros()
    assert bool(a.is_raw_equal(b, tol=1e-5))
    np.testing.assert_allclose(
        hist["differs"], ref.differs_history, rtol=1e-3, atol=1e-5
    )
