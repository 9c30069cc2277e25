"""Pallas ring all-gather over explicit inter-chip RDMA.

The blueprint's last distributed row (SURVEY.md §2.6) names "async
remote copies" as the mechanism for the rotating B-block exchange.
`jax.lax.ppermute` leaves the schedule to XLA; this module implements
the rotation DIRECTLY with `pltpu.make_async_remote_copy`: blocks are
forwarded straight between OUTPUT regions, each region written exactly
once with its own DMA semaphore pair — no staging-buffer reuse, hence
no write-after-read hazard and no credit protocol (a double-buffered
staging design needs upstream credits: ring causality does NOT order a
neighbour's next write against this chip's in-flight read of the same
slot).  The serial d-1-hop chain is the all-gather critical path;
overlapping COMPUTE with the remaining hops (consuming block k's
segments while block k+1 flies) is the natural extension point for a
fused distributed SpGEMM kernel.

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


def _ring_ag_kernel(in_ref, out_ref, send_sem, recv_sem, *, d, lr, axis):
    me = jax.lax.axis_index(axis)
    dst = (me + 1) % d

    def rdma(k):
        # step k forwards output block k (received at step k-1; block 0
        # is the local input) into the right neighbour's block k+1.
        # Every output region is written exactly ONCE and read only
        # after its recv semaphore — no buffer reuse, so no WAR race
        # (the earlier double-buffered staging design had one: nothing
        # gated a neighbour's next write against this chip's in-flight
        # read of the same slot).  One DMA semaphore pair per step.
        return pltpu.make_async_remote_copy(
            src_ref=out_ref.at[pl.ds(k * lr, lr)],
            dst_ref=out_ref.at[pl.ds((k + 1) * lr, lr)],
            send_sem=send_sem.at[k],
            recv_sem=recv_sem.at[k],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    out_ref[pl.ds(0, lr)] = in_ref[...]
    for k in range(d - 1):
        # block k is resident (k=0: just written; k>0: waited last step)
        rdma(k).start()
        rdma(k).wait()  # shard (me-k-1) mod d's block lands at k+1


@partial(jax.jit, static_argnames=("axis", "d", "interpret"))
def ring_all_gather(x, axis: str, d: int, interpret: bool = False):
    """All-gather ``x`` [lr, ...] -> [d*lr, ...] along mesh axis ``axis``
    via an explicit RDMA ring (call under shard_map).  Blocks land in
    rotation order: output rows [k*lr, (k+1)*lr) hold the block of shard
    (me - k) mod d — use :func:`unrotate` for owner-major order."""
    lr = x.shape[0]
    kern = partial(_ring_ag_kernel, d=d, lr=lr, axis=axis)
    nsem = max(d - 1, 1)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((d * lr,) + x.shape[1:], x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((nsem,)),
            pltpu.SemaphoreType.DMA((nsem,)),
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
