"""Sparse kernels: SpGEMM, SpMV/SpMM, flops estimation, prune/normalize."""
