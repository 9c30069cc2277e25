"""Matrix ingestion: SNAP edge lists and MatrixMarket files (host-side)."""

from __future__ import annotations

import numpy as np

from .matrix_market import read_matrix_market, write_matrix_market
from .snap import read_snap

__all__ = [
    "read_matrix_market",
    "write_matrix_market",
    "read_snap",
    "load_coo",
]


def load_coo(path: str, is_trans: bool = True, extra_capacity: int = 0):
    """Read a SNAP or MatrixMarket file into a device COO.

    ``extra_capacity`` reserves padded slots (e.g. ``nrows`` for
    add_self_loops).  Mirrors the reference ingestion entry points
    (COO.cc:43-46, COO.cc:48-158).
    """
    from ..formats.coo import COO

    if path.endswith(".mtx"):
        # The reference feeds .mtx files through readSNAPFile too
        # (mindex2-cuda/nGpuSpMM.cc:286), which honours the MM banner.
        row, col, val, nrows, ncols = read_snap(path, is_trans=is_trans)
    else:
        row, col, val, nrows, ncols = read_snap(path, is_trans=is_trans)
    cap = row.shape[0] + int(extra_capacity)
    return COO.from_numpy(row, col, val, nrows, ncols, capacity=max(cap, 1))
