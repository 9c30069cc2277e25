"""Slope-timed probe of ELEMENT-granularity ops (round-1 claims re-check).

Round 1 recorded 1-D element gathers at ~100-160 M elem/s and scatter-add
at ~75 M elem/s — measured with the broken block_until_ready timing.  If
XLA element gathers are actually fast, the flat-CSR assembly collapses to
one direct gather (no 16-wide window tricks, no narrow-lane OOM at s16).

Probes (all 16M elements, slope-timed):
  egather      — out[q] = src[idx[q]], random idx
  egather-win  — idx affine in 16-windows (the assembly's actual pattern)
  scatter-add  — zeros.at[idx].add(vals)
  sort1d       — lax.sort of 16M int32 keys + f32 values (global ESC cost)
  searchsorted — 16M queries into a 64k table
  cumsum1d     — 16M f32
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(build_fn, ks=(2, 8), iters=3):
    times = {}
    for k in ks:
        f = build_fn(k)
        float(f())
        ts = []
        for _ in range(iters):
            t0 = time.monotonic()
            float(f())
            ts.append((time.monotonic() - t0) * 1e3)
        ts.sort()
        times[k] = ts[len(ts) // 2]
    k1, k2 = ks
    return (times[k2] - times[k1]) / (k2 - k1)


def scan_wrap(op, n_idx):
    """op(idx, x) -> arrays; returns build_fn(k) with idx rolled per step."""

    def build(k):
        @jax.jit
        def f():
            def body(carry, x):
                i, acc = carry
                outs = op(i, x)
                s = sum(
                    jnp.sum(o).astype(jnp.float32)
                    for o in jax.tree.leaves(outs)
                )
                return (jnp.roll(i, 1), acc + s), None

            (_, acc), _ = jax.lax.scan(
                body, (n_idx, 0.0), jnp.zeros(k)
            )
            return acc

        return f

    return build


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    n = 16 << 20

    src = jnp.asarray(rng.random(n).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, size=n).astype(np.int32))
    ms = slope_time(scan_wrap(lambda i, x: src[i] + x, idx))
    print(f"egather 16M random     {ms:8.2f} ms  {n/ms/1e3:9.1f} M elem/s", flush=True)

    # affine-in-window indices: idx[q] = base[q//16] + q%16 (assembly shape)
    base = np.sort(rng.integers(0, n - 16, size=n // 16)).astype(np.int32)
    widx = jnp.asarray(
        (base[:, None] + np.arange(16, dtype=np.int32)[None, :]).reshape(-1)
    )
    ms = slope_time(scan_wrap(lambda i, x: src[i] + x, widx))
    print(f"egather 16M windowed   {ms:8.2f} ms  {n/ms/1e3:9.1f} M elem/s", flush=True)

    vals = jnp.asarray(rng.random(n).astype(np.float32))
    ms = slope_time(
        scan_wrap(
            lambda i, x: jnp.zeros((n,), jnp.float32).at[i].add(vals + x),
            idx,
        )
    )
    print(f"scatter-add 16M        {ms:8.2f} ms  {n/ms/1e3:9.1f} M elem/s", flush=True)

    keys = jnp.asarray(rng.integers(0, 1 << 30, size=n).astype(np.int32))
    ms = slope_time(
        scan_wrap(
            lambda i, x: jax.lax.sort((keys ^ i[0], vals + x), num_keys=1),
            idx,
        )
    )
    print(f"sort1d 16M k+v         {ms:8.2f} ms  {n/ms/1e3:9.1f} M elem/s", flush=True)

    table = jnp.asarray(np.sort(rng.integers(0, 1 << 30, size=65536)).astype(np.int32))
    ms = slope_time(
        scan_wrap(lambda i, x: jnp.searchsorted(table, keys ^ i[0]), idx)
    )
    print(f"searchsorted 16M/64k   {ms:8.2f} ms  {n/ms/1e3:9.1f} M elem/s", flush=True)

    ms = slope_time(scan_wrap(lambda i, x: jnp.cumsum(vals + x), idx))
    print(f"cumsum1d 16M           {ms:8.2f} ms  {n/ms/1e3:9.1f} M elem/s", flush=True)


if __name__ == "__main__":
    main()
