"""Second probe round: trust-but-verify the fast paths.

- minor-axis sort at several shapes, with correctness check
- row-gather throughput vs row width (8..128)
- 2-operand minor sort (key+val) vs 3-operand
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sparse_matrix_with_flops_tpu.utils.timing import bench_fn


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    for rows, w in [(16384, 1024), (4096, 4096), (131072, 128), (16384, 2048)]:
        k = jnp.asarray(rng.integers(0, 1 << 30, size=(rows, w)).astype(np.int32))
        v = jnp.asarray(rng.random((rows, w)).astype(np.float32))
        f = jax.jit(lambda k, v: jax.lax.sort((k, v), dimension=1, num_keys=1))
        ms = bench_fn(f, k, v, warmup=1, iters=5)
        out_k, out_v = f(k, v)
        ok = bool(jnp.all(out_k[:, 1:] >= out_k[:, :-1]))
        # payload integrity: sums preserved per row
        ok &= bool(
            jnp.allclose(
                jnp.sort(v, axis=1), jnp.sort(out_v, axis=1), atol=1e-6
            )
        )
        mb = rows * w * 8 / 1e6
        print(
            f"sort ({rows:6d},{w:4d}) {ms:8.2f} ms  {mb/ms:8.1f} GB/s  sorted={ok}",
            flush=True,
        )

    n_src = 200_000
    for w in [8, 16, 32, 64, 128, 256]:
        total = 16_000_000 // w  # ~16M elements gathered
        src = jnp.asarray(rng.random((n_src, w)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, n_src, size=total).astype(np.int32))
        f = jax.jit(lambda i, s: jnp.take(s, i, axis=0))
        ms = bench_fn(f, idx, src, warmup=1, iters=5)
        mb = total * w * 4 / 1e6
        print(
            f"row-gather w={w:4d} ({total} rows) {ms:8.2f} ms  {mb/ms:8.1f} GB/s",
            flush=True,
        )

    # int64 pack/unpack + element gather comparison at 4M
    src64 = jnp.asarray(rng.integers(0, 1 << 60, size=4_000_000).astype(np.int64))
    idx4 = jnp.asarray(rng.integers(0, 4_000_000, size=4_000_000).astype(np.int32))
    f = jax.jit(lambda i, s: jnp.take(s, i))
    ms = bench_fn(f, idx4, src64, warmup=1, iters=5)
    print(f"elem-gather 4M int64 {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
