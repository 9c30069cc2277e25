"""Sparse matrix containers (L1 format layer, TPU-native pytrees)."""

from .coo import COO
from .csr import CSR

__all__ = ["COO", "CSR"]
