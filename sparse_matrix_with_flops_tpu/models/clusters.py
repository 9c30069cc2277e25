"""Cluster extraction from a converged R-MCL iterate.

The reference stops at the converged matrix (its drivers only print
timings / compare iterates); actually *reading out* the clustering —
MCL's interpretation step — is left to the user.  This module supplies it:
nodes belong to the same cluster iff they are connected in the symmetrised
support of the converged column-stochastic matrix (attractor components).

Host-side union-find (path-halving): the converged matrix is tiny
(≤ S entries/row after pruning), so this is O(nnz α(n)).
"""

from __future__ import annotations

import numpy as np

from ..formats.csr import CSR


def extract_clusters(mt: CSR, weight_floor: float = 1e-6) -> np.ndarray:
    """Cluster label per node (labels are the component's smallest node id).

    ``weight_floor`` drops numerically-dead entries before linking.
    """
    rp = np.asarray(mt.row_ptr, dtype=np.int64)
    nnz = int(rp[-1])
    col = np.asarray(mt.col_ind)[:nnz]
    val = np.asarray(mt.values)[:nnz]
    row = np.repeat(np.arange(mt.rows, dtype=np.int64), np.diff(rp))
    keep = val > weight_floor
    row, col = row[keep], col[keep].astype(np.int64)

    parent = np.arange(mt.rows, dtype=np.int64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(row, col):
        if b >= mt.rows:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    labels = np.fromiter((find(i) for i in range(mt.rows)), np.int64, mt.rows)
    return labels


def cluster_sizes(labels: np.ndarray) -> dict:
    """{label: member count}, descending by size."""
    uniq, counts = np.unique(labels, return_counts=True)
    order = np.argsort(-counts)
    return {int(uniq[i]): int(counts[i]) for i in order}
