"""Isolate the hub-path B-densify + matmul costs (s14-shaped by default:
K=N=16384, nnz(B)~130k, H=696 hub rows).

Variants slope-timed:
  densify:
    slab4-2d-add   4 column slabs, 2-D (row, col) scatter-add (committed)
    slab4-1d-add   4 slabs, linear flat scatter-add + reshape
    slab1-2d-add   single full-width slab, 2-D scatter-add
    slab1-1d-set   single slab, linear scatter-SET, unique_indices
    slab4-1d-set   4 slabs, linear scatter-set, unique_indices
  matmul (a_d [H, K] @ b_d [K, N]):
    mm-default     f32 inputs, default precision
    mm-highest     f32 inputs, precision=HIGHEST
    mm-bf16        bf16 inputs, f32 accumulation

Usage: python tools/probe_bdense.py [K] [nnz] [H]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sparse_matrix_with_flops_tpu.utils.timing import slope_bench

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    nnz = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 696
    N = K
    rng = np.random.default_rng(0)
    erow = jnp.asarray(
        np.sort(rng.integers(0, K, nnz)).astype(np.int32)
    )
    ecol = jnp.asarray(rng.integers(0, N, nnz).astype(np.int32))
    evals = jnp.asarray(rng.random(nnz).astype(np.float32))
    print(f"backend={jax.default_backend()} K={K} nnz={nnz} H={H}", flush=True)

    def mk_slab_fns(n_slabs, linear, mode):
        slab = -(-N // n_slabs)

        def fn(x):
            v = evals + x
            tot = jnp.float32(0)
            for sl in range(n_slabs):
                cl = ecol - sl * slab
                ok = (cl >= 0) & (cl < slab)
                tgt = jnp.where(ok, cl, slab)
                if linear:
                    lin = jnp.where(
                        ok, erow * slab + jnp.minimum(tgt, slab - 1),
                        K * slab,
                    )
                    bd = jnp.zeros((K * slab,), jnp.float32)
                    if mode == "set":
                        bd = bd.at[lin].set(
                            v, mode="drop", unique_indices=True
                        )
                    else:
                        bd = bd.at[lin].add(v, mode="drop")
                    bd = bd.reshape(K, slab)
                else:
                    bd = jnp.zeros((K, slab), jnp.float32)
                    if mode == "set":
                        bd = bd.at[erow, tgt].set(
                            v, mode="drop", unique_indices=True
                        )
                    else:
                        bd = bd.at[erow, tgt].add(v, mode="drop")
                tot = tot + jnp.sum(bd)
            return tot

        return fn

    variants = [
        ("slab4-2d-add", mk_slab_fns(4, False, "add")),
        ("slab4-1d-add", mk_slab_fns(4, True, "add")),
        ("slab1-2d-add", mk_slab_fns(1, False, "add")),
        ("slab1-1d-set", mk_slab_fns(1, True, "set")),
        ("slab4-1d-set", mk_slab_fns(4, True, "set")),
    ]
    for name, fn in variants:
        ms = slope_bench(fn, ks=(1, 5))
        print(f"{name:14s} {ms:8.2f} ms", flush=True)

    # matmul variants: dense B generated in-program behind an
    # optimization barrier (a captured 1 GB array would be inlined as an
    # HLO literal and blow the remote-compile request), outside the scan
    # so the slope excludes generation.
    flops = 2.0 * H * K * N

    def mm_slope(name, dot_fn, ks=(1, 5)):
        import time as _time

        def build(k):
            @jax.jit
            def f():
                r = jax.lax.broadcasted_iota(jnp.float32, (K, N), 0)
                c = jax.lax.broadcasted_iota(jnp.float32, (K, N), 1)
                bd = jax.lax.optimization_barrier(
                    jnp.sin(r * 0.001 + c * 0.002) * 0.01
                )
                ad = jax.lax.optimization_barrier(
                    jnp.sin(
                        jax.lax.broadcasted_iota(jnp.float32, (H, K), 1)
                    )
                    * 0.01
                )

                def body(acc, x):
                    return acc + jnp.sum(dot_fn(ad + x, bd)), None

                acc, _ = jax.lax.scan(
                    body, jnp.float32(0.0), jnp.zeros(k)
                )
                return acc

            return f

        ts = {}
        for k in ks:
            f = build(k)
            float(f())
            samples = []
            for _ in range(5):
                t0 = _time.monotonic()
                float(f())
                samples.append((_time.monotonic() - t0) * 1e3)
            samples.sort()
            ts[k] = samples[len(samples) // 2]
        k1, k2 = ks
        ms = (ts[k2] - ts[k1]) / (k2 - k1)
        print(
            f"{name:14s} {ms:8.2f} ms  {flops / ms / 1e9:8.2f} TFLOPS",
            flush=True,
        )

    mm_slope(
        "mm-default",
        lambda a_, b_: jnp.dot(a_, b_, preferred_element_type=jnp.float32),
    )
    mm_slope(
        "mm-highest",
        lambda a_, b_: jnp.dot(
            a_, b_,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ),
    )
    mm_slope(
        "mm-bf16",
        lambda a_, b_: jnp.dot(
            a_.astype(jnp.bfloat16),
            b_.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ),
    )


if __name__ == "__main__":
    main()
