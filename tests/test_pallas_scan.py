"""Pallas single-pass cumsum vs numpy (interpret mode on CPU)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from sparse_matrix_with_flops_tpu.ops.pallas_scan import cumsum_i32


@pytest.mark.parametrize(
    "n", [1, 7, 128, 65536, 65536 + 1, 3 * 65536 + 12345]
)
def test_cumsum_i32_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = rng.integers(-5, 9, size=n).astype(np.int32)
    got = np.asarray(cumsum_i32(jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(got, np.cumsum(x))


def test_cumsum_i32_zeros_and_negatives():
    x = np.array([0, 0, -1, 5, 0, -4], np.int32)
    got = np.asarray(cumsum_i32(jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(got, np.cumsum(x))


def test_compact_nonzero_rows_wide_widths():
    """The hub-row compaction gate runs the Pallas log-shift kernel up
    to width 131072 (s17 hub rows) — round 4 raised its scoped-VMEM
    limit past Mosaic's 16 MB default.  Interpret-mode pin of the same
    kernel at the wide widths against a host oracle."""
    import numpy as np
    import jax.numpy as jnp

    from sparse_matrix_with_flops_tpu.ops.pallas_sort import (
        compact_nonzero_rows,
    )

    rng = np.random.default_rng(9)
    for n in (65536, 131072):
        v = np.where(
            rng.random((8, n)) < 0.05,
            rng.random((8, n)).astype(np.float32),
            0.0,
        ).astype(np.float32)
        k, cv = compact_nonzero_rows(jnp.asarray(v), n, interpret=True)
        kk, vv = np.asarray(k), np.asarray(cv)
        for i in range(8):
            nz = np.nonzero(v[i])[0]
            assert np.array_equal(kk[i][: nz.size], nz)
            assert np.allclose(vv[i][: nz.size], v[i][nz])
            assert np.all(kk[i][nz.size :] == n)
