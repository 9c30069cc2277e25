"""Pallas ring all-gather: inter-chip RDMA with transfer/copy overlap.

The blueprint's last distributed row (SURVEY.md §2.6) names "async
remote copies" as the comm/compute-overlap mechanism for the rotating
B-block exchange.  `jax.lax.ppermute` delegates that overlap to XLA's
async collective-permute; this module implements the rotation DIRECTLY
with `pltpu.make_async_remote_copy` so the overlap is explicit and
schedulable: each step STARTS the next block's RDMA before copying the
received block into the output, so the wire transfer of step k+1 rides
under the VMEM->HBM copy of step k.

Used as ``exchange="pallas_ring"`` in parallel.rmcl_ell — functionally
an all-gather (full replica per chip, like exchange="all_gather") with
ring traffic.  On the one-chip dev environment it runs under Pallas
TPU interpret mode on the virtual CPU mesh (tests/test_pallas_ring.py
pins it against lax.all_gather); the kernel itself is the multi-chip
artifact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ring_ag_kernel(in_ref, out_ref, comm, send_sem, recv_sem, *, d, lr, axis):
    me = jax.lax.axis_index(axis)
    dst = (me + 1) % d

    def rdma(k):
        # step k forwards the block received at step k-1 (slot k%2) to
        # the right neighbour's slot (k+1)%2.  Ring causality makes the
        # double buffer safe: the left neighbour's step-(k+1) write into
        # slot k%2 can only start after it received the block THIS chip
        # sent at step k, i.e. after this chip's slot-k%2 read completed.
        return pltpu.make_async_remote_copy(
            src_ref=comm.at[k % 2],
            dst_ref=comm.at[(k + 1) % 2],
            send_sem=send_sem.at[k % 2],
            recv_sem=recv_sem.at[(k + 1) % 2],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    comm[0] = in_ref[...]
    if d > 1:
        rdma(0).start()
    out_ref[pl.ds(0, lr)] = in_ref[...]  # overlaps transfer 0
    for k in range(d - 1):
        rdma(k).wait()  # block of shard (me-k-1) mod d lands in (k+1)%2
        if k + 1 < d - 1:
            rdma(k + 1).start()
        # the received block's output copy overlaps transfer k+1
        out_ref[pl.ds((k + 1) * lr, lr)] = comm[(k + 1) % 2]


@partial(jax.jit, static_argnames=("axis", "d", "interpret"))
def ring_all_gather(x, axis: str, d: int, interpret: bool = False):
    """All-gather ``x`` [lr, ...] -> [d*lr, ...] along mesh axis ``axis``
    via an explicit RDMA ring (call under shard_map).  Blocks land in
    rotation order: output rows [k*lr, (k+1)*lr) hold the block of shard
    (me - k) mod d — use :func:`unrotate` for owner-major order."""
    lr = x.shape[0]
    kern = partial(_ring_ag_kernel, d=d, lr=lr, axis=axis)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((d * lr,) + x.shape[1:], x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2,) + x.shape, x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(collective_id=0),
        interpret=interpret,
    )(x)


def unrotate(gathered, axis: str, d: int):
    """Reorder a ring_all_gather result from rotation order (block k =
    shard (me-k) mod d) to owner-major order (block j = shard j)."""
    me = jax.lax.axis_index(axis)
    lr = gathered.shape[0] // d
    blocks = gathered.reshape((d, lr) + gathered.shape[1:])
    # position of owner j in the rotation = (me - j) mod d
    pos_of_owner = (me - jnp.arange(d, dtype=jnp.int32)) % d
    return jnp.take(blocks, pos_of_owner, axis=0).reshape(gathered.shape)
