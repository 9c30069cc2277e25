"""Probe: why hub compaction costs ~12 ms IN CONTEXT but 0.5 ms isolated.

Reproduce the real hub context exactly: B-dense built on device by a
linear-index scatter (small host constants), then the (H, K) @ (K, N)
matmul, then compact_nonzero_rows — and time cumulative cutoffs.

Usage: python tools/probe_compact2.py [H] [K] [N]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sparse_matrix_with_flops_tpu.ops.pallas_sort import compact_nonzero_rows
    from sparse_matrix_with_flops_tpu.utils.timing import slope_bench

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 568
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 16384
    rng = np.random.default_rng(0)
    bnnz = 120_000
    lin = jnp.asarray(
        rng.choice(k * n, size=bnnz, replace=False).astype(np.int64)
    )
    bval = jnp.asarray(rng.random(bnnz).astype(np.float32) + 0.1)
    ad = jnp.asarray((rng.random((h, k)) < 0.02).astype(np.float32))
    print(f"backend={jax.default_backend()} H={h} K={k} N={n}", flush=True)

    def bdense(x):
        return (
            jnp.zeros((k * n,), jnp.float32)
            .at[lin]
            .set(bval + x)
            .reshape(k, n)
        )

    ms = slope_bench(lambda x: bdense(x))
    print(f"bdense only:             {ms:8.2f} ms", flush=True)

    def mm(x):
        return jnp.dot(ad + x, bdense(x), preferred_element_type=jnp.float32)

    ms = slope_bench(lambda x: jnp.sum(mm(x) ** 2))
    print(f"bdense+matmul (sum c^2): {ms:8.2f} ms", flush=True)

    ms = slope_bench(lambda x: mm(x))
    print(f"bdense+matmul (materialized): {ms:8.2f} ms", flush=True)

    ms = slope_bench(lambda x: compact_nonzero_rows(mm(x), n))
    print(f"bdense+matmul+compact:   {ms:8.2f} ms", flush=True)

    def with_counts(x):
        key, vals = compact_nonzero_rows(mm(x), n)
        cnt = jnp.sum(key < n, axis=1)
        return key, vals, cnt

    ms = slope_bench(with_counts)
    print(f"... + counts + reshape:  {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
