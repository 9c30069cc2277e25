"""Device mesh construction — the distributed substrate the reference lacks.

The reference is strictly single-node shared-memory + one GPU (SURVEY.md §2.6:
no MPI/NCCL/UCX anywhere; its only 'communication' is cudaMemcpy,
nlibs/CSR.cc:342-371).  The TPU rebuild makes multi-chip execution a
first-class layer: a 1-D mesh over the row axis ('x') for row-partitioned
SpGEMM / R-MCL, riding ICI collectives inserted by shard_map.

On a multi-host deployment call :func:`init_distributed` first
(jax.distributed.initialize), then :func:`make_mesh` builds the global mesh
spanning all processes; DCN connects host groups, ICI connects chips within
a slice — `jax.make_mesh` orders axes so the fastest-varying axis maps to
ICI neighbours.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROW_AXIS = "x"


def init_distributed(**kwargs) -> None:
    """Multi-host bring-up (no-op on a single process)."""
    if jax.process_count() > 1 or kwargs:
        jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: int | None = None, axis: str = ROW_AXIS) -> Mesh:
    """1-D mesh over ``n_devices`` (default: all visible devices)."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return jax.make_mesh((n_devices,), (axis,), devices=devs[:n_devices])


def row_sharding(mesh: Mesh, axis: str = ROW_AXIS) -> NamedSharding:
    """Sharding that splits the leading (shard-stack) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
