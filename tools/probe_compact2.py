"""Probe: why hub compaction costs ~12 ms IN CONTEXT but 0.5 ms isolated.

Hypothesis: the (hcp, ncp) matmul output arrives in a layout the Pallas
custom call can't consume, inserting a relayout/copy; or the fusion
boundary changes.  Measure matmul-only vs matmul+compact vs
matmul+lane-sort-fallback at the s14 hub shape.

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
    # sparse-ish B so c_d has realistic zero density
    bd = (rng.random((k, n)) < 0.0005).astype(np.float32) * rng.random((k, n)).astype(np.float32)
    ad = (rng.random((h, k)) < 0.02).astype(np.float32)
    dbd = jnp.asarray(bd)
    dad = jnp.asarray(ad)
    print(f"backend={jax.default_backend()} H={h} K={k} N={n}", flush=True)

    ms = slope_bench(lambda x: jnp.dot(dad + x, dbd, preferred_element_type=jnp.float32))
    print(f"matmul only:            {ms:8.2f} ms", flush=True)

    def mm_compact(x):
        c = jnp.dot(dad + x, dbd, preferred_element_type=jnp.float32)
        return compact_nonzero_rows(c, n)

    ms = slope_bench(mm_compact)
    print(f"matmul + compact:       {ms:8.2f} ms", flush=True)

    def mm_copy_compact(x):
        c = jnp.dot(dad + x, dbd, preferred_element_type=jnp.float32)
        c = jax.lax.optimization_barrier(c * 1.0)
        return compact_nonzero_rows(c, n)

    ms = slope_bench(mm_copy_compact)
    print(f"matmul + barrier+compact:{ms:7.2f} ms", flush=True)

    def mm_sort(x):
        c = jnp.dot(dad + x, dbd, preferred_element_type=jnp.float32)
        lanes = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
        key = jnp.where(c != 0, lanes, n)
        return jax.lax.sort((key, c), dimension=1, num_keys=1)

    ms = slope_bench(mm_sort)
    print(f"matmul + XLA lane sort: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
