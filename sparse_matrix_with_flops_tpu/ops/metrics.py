"""Sparse convergence metrics.

Replaces the reference's ``CSR::differs`` L2 drift (CSR.cc:213-240) and
``differsStats`` per-row-growth histogram (CSR.cc:381-415) with
sparse-native reductions: a union of the two entry streams followed by a
segment-sum — O(nnz log nnz), no densification, jit/scan friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import INDEX_DTYPE, QVALUE_DTYPE
from ..formats.csr import CSR
from .segments import segment_boundaries


def csr_frobenius_diff(a: CSR, b: CSR) -> tuple[jax.Array, jax.Array]:
    """(||A − B||_F², ||A||_F²) over the union pattern."""
    rows = a.rows
    r = jnp.concatenate([a.entry_rows(), b.entry_rows()])
    c = jnp.concatenate([a.col_ind, b.col_ind])
    v = jnp.concatenate([a.values, -b.values]).astype(QVALUE_DTYPE)
    valid = jnp.concatenate([a.entry_valid(), b.entry_valid()])
    r = jnp.where(valid, r, rows).astype(INDEX_DTYPE)
    r, c, v = jax.lax.sort((r, c, v), num_keys=2)
    ok = r < rows
    flags = segment_boundaries(r, c, ok)
    seg = jnp.cumsum(flags.astype(INDEX_DTYPE)) - 1
    seg = jnp.where(ok, seg, r.shape[0] - 1)
    sums = jax.ops.segment_sum(jnp.where(ok, v, 0.0), seg, num_segments=r.shape[0])
    diff_sq = jnp.sum(sums * sums)
    a_sq = jnp.sum(jnp.where(a.entry_valid(), a.values**2, 0.0))
    return diff_sq, a_sq


def differs(a: CSR, b: CSR) -> jax.Array:
    """Relative Frobenius drift ||A − B||_F / ||A||_F (CSR::differs role)."""
    d2, n2 = csr_frobenius_diff(a, b)
    return jnp.sqrt(d2) / jnp.maximum(jnp.sqrt(n2), 1e-30)


def row_growth_histogram(
    prev: CSR,
    new: CSR,
    bounds=(-30.0, -20.0, -5.0, 0.0, 5.0, 20.0, 30.0, 100.0),
) -> jax.Array:
    """Histogram of per-row nnz percent change (differsStats,
    CSR.cc:381-415; bucket bounds from qrmcl.cc:17)."""
    ca = prev.row_counts().astype(jnp.float32)
    cb = new.row_counts().astype(jnp.float32)
    pct = 100.0 * (cb - ca) / jnp.maximum(ca, 1.0)
    edges = jnp.asarray(bounds, dtype=jnp.float32)
    idx = jnp.searchsorted(edges, pct, side="left")
    return jnp.bincount(idx, length=len(bounds) + 1)
