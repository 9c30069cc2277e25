"""Host planner primitives (utils/nphost) vs their obvious-numpy oracles."""

import numpy as np
import pytest

from sparse_matrix_with_flops_tpu.utils.nphost import (
    concat_ranges,
    fast_repeat,
    pow2ceil_arr,
    repeat_idx,
    segment_sums,
    snap_chunks_arr,
)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_repeat_idx_matches_np_repeat(seed):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 7, size=50)
    counts[rng.integers(0, 50, size=10)] = 0  # zero runs must collapse
    want = np.repeat(np.arange(counts.size), counts)
    got = repeat_idx(counts)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, want)


def test_repeat_idx_empty_and_single():
    assert repeat_idx(np.zeros(0, np.int64)).size == 0
    np.testing.assert_array_equal(
        repeat_idx(np.array([4])), np.zeros(4, np.int32)
    )


def test_fast_repeat_matches_np_repeat():
    rng = np.random.default_rng(3)
    counts = rng.integers(0, 5, size=40)
    vals = rng.integers(-100, 100, size=40)
    np.testing.assert_array_equal(
        fast_repeat(vals, counts), np.repeat(vals, counts)
    )


def test_concat_ranges():
    starts = np.array([3, 10, 10, 20])
    ends = np.array([6, 10, 13, 21])
    want = np.concatenate([np.arange(s, e) for s, e in zip(starts, ends)])
    np.testing.assert_array_equal(concat_ranges(starts, ends), want)


def test_segment_sums():
    rng = np.random.default_rng(4)
    vals = rng.integers(0, 1000, size=30)
    rp = np.array([0, 0, 5, 5, 12, 30])
    want = np.array([vals[s:e].sum() for s, e in zip(rp[:-1], rp[1:])])
    np.testing.assert_array_equal(segment_sums(vals, rp), want)


def test_pow2ceil_arr():
    n = np.array([0, 1, 2, 3, 4, 5, 63, 64, 65, 2**30, 2**30 + 1])
    want = np.array(
        [1, 1, 2, 4, 4, 8, 64, 64, 128, 2**30, 2**31], dtype=np.int64
    )
    np.testing.assert_array_equal(pow2ceil_arr(n), want)


def test_snap_chunks_lattice():
    # {2^k, 3*2^k}: 1,2,3,4,6,8,12,16,24,32,...
    n = np.arange(1, 33)
    got = snap_chunks_arr(n)
    lattice = {1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64}
    assert all(int(x) in lattice for x in got)
    assert (got >= n).all()
    # tight: no lattice value between n and snap(n)
    for v, s in zip(n, got):
        between = [l for l in sorted(lattice) if v <= l < s]
        assert not between, (v, s)


def test_thp_allocator_roundtrip_if_installed():
    """The THP numpy allocator (native/src/thpalloc.c) must be invisible
    semantically: big/small alloc, calloc-zeroing (including from its
    mapping cache), resize."""
    big = np.zeros(2_000_000, dtype=np.float64)
    assert (big == 0).all()
    big[:] = 1.5
    del big
    big2 = np.zeros(2_000_000, dtype=np.float64)  # may reuse dirty cache
    assert (big2 == 0).all()
    r = np.arange(500_000)
    r.resize(2_000_000, refcheck=False)
    assert r[499_999] == 499_999 and r[500_000] == 0
