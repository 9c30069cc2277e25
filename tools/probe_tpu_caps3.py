"""Probe 3: map the minor-axis sort fast-path envelope precisely.

Suspicion: (16384,1024) hit a special XLA lowering. Sweep shapes, use the
results (checksum) to defeat any laziness, repeat cases for stability.
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

    def run(rows, w, tag=""):
        k = jnp.asarray(rng.integers(0, 1 << 30, size=(rows, w)).astype(np.int32))
        v = jnp.asarray(rng.random((rows, w)).astype(np.float32))

        def f(k, v):
            sk, sv = jax.lax.sort((k, v), dimension=1, num_keys=1)
            return sk[:, -1].sum() + sv[:, 0].sum()  # force full materialise

        ms = bench_fn(jax.jit(f), k, v, warmup=1, iters=5)
        me = rows * w / 1e6
        print(
            f"sort+use ({rows:6d},{w:5d}) {tag:3s} {ms:9.2f} ms   {me/ms*1000:9.1f} M elem/s",
            flush=True,
        )

    for rows in [8192, 16384, 32768]:
        for w in [256, 512, 1024, 2048]:
            run(rows, w)
    run(16384, 1024, "2nd")
    run(131072, 256)

    # row-gather, result used
    src = jnp.asarray(rng.random((200_000, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 200_000, size=125_000).astype(np.int32))

    def g(i, s):
        return jnp.take(s, i, axis=0).sum()

    ms = bench_fn(jax.jit(g), idx, src, warmup=1, iters=5)
    print(f"row-gather+use w=128 (125k rows) {ms:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
