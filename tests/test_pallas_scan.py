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
