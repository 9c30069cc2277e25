"""Explicit-RDMA ring all-gather (parallel/pallas_ring) on the virtual
CPU mesh via Pallas TPU interpret mode, pinned against lax.all_gather —
the make_async_remote_copy exchange named by the blueprint (SURVEY §2.6
last row)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sparse_matrix_with_flops_tpu.parallel import make_mesh
from sparse_matrix_with_flops_tpu.parallel.pallas_ring import (
    ring_all_gather,
    unrotate,
)


@pytest.mark.parametrize("nd", [2, 4, 8])
def test_ring_all_gather_matches_lax(nd):
    mesh = make_mesh(nd)
    lr, s = 8, 128
    x = jnp.arange(nd * lr * s, dtype=jnp.float32).reshape(nd * lr, s)

    def kernel(blk):
        g = unrotate(ring_all_gather(blk[0], "x", nd, interpret=True), "x", nd)
        want = jax.lax.all_gather(blk[0], "x").reshape(nd * lr, s)
        return g[None], want[None]

    got, want = shard_map(
        kernel,
        mesh=mesh,
        in_specs=P("x"),
        out_specs=(P("x"), P("x")),
        check_vma=False,
    )(x.reshape(nd, lr, s))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_rmcl_pallas_ring_exchange_matches_all_gather(rng):
    """exchange='pallas_ring' must produce the exact all_gather-mode
    iterate (the RDMA ring is a drop-in transport)."""
    from sparse_matrix_with_flops_tpu.formats.csr import CSR
    from sparse_matrix_with_flops_tpu.parallel.rmcl_ell import sharded_rmcl_ell

    n, d = 64, 4
    dense = np.zeros((n, n), np.float32)
    for i in range(n):
        cols = rng.choice(n, size=6, replace=False)
        dense[i, cols] = 1.0
        dense[i, i] = 1.0
    mt0 = CSR.from_dense(dense).aver_and_norm_rows()
    mesh = make_mesh(d)
    ref, _ = sharded_rmcl_ell(mt0, mesh, max_iters=3, S=16, exchange="all_gather")
    got, _ = sharded_rmcl_ell(mt0, mesh, max_iters=3, S=16, exchange="pallas_ring")
    a = got.make_ordered()._drop_explicit_zeros()
    b = ref.make_ordered()._drop_explicit_zeros()
    assert bool(a.is_raw_equal(b, tol=1e-6))
