"""Distributed layer: mesh + row-sharded SpGEMM / R-MCL (new vs reference)."""

from .mesh import ROW_AXIS, init_distributed, make_mesh, replicated, row_sharding
from .sharded import (
    ShardedCSR,
    flops_balanced_permutation,
    shard_csr,
    unshard_csr,
)
from .spgemm import sharded_spgemm, sharded_spgemm_ring
from .rmcl import (
    plan_shard_capacities,
    sharded_rmcl_adaptive,
    sharded_rmcl_scan,
    sharded_rmcl_step,
)

__all__ = [
    "ROW_AXIS",
    "init_distributed",
    "make_mesh",
    "replicated",
    "row_sharding",
    "ShardedCSR",
    "flops_balanced_permutation",
    "shard_csr",
    "unshard_csr",
    "sharded_spgemm",
    "sharded_spgemm_ring",
    "plan_shard_capacities",
    "sharded_rmcl_adaptive",
    "sharded_rmcl_scan",
    "sharded_rmcl_step",
]
