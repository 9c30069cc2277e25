"""Round-5 probe: why does sort_dedup_compact run ~300 ns/lane at
W=32768 when the lane model says ~1-4 ns (VERDICT r4 #2)?

Hypotheses:
  H1  pltpu.roll itself degrades at large widths / large shifts
      (cross-vreg lane permutes lower to a slow path).
  H2  the (8, W) block shape starves the VPU (too few sublanes per
      vreg row at huge widths).
  H3  folded layout fixes it: reshape each W row to (W/512, 512) so
      every exchange is either a <=512-lane roll or a sublane-axis
      roll (vreg-row permute, no lane crossing).

Measures, per width: a fixed-count roll microkernel (pure roll+add),
the production sdc, and a folded-roll microkernel.  ns/lane-op rates
printed per row.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")


def bench(f, *args, iters=5):
    o = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.monotonic()
        jax.block_until_ready(f(*args))
        ts.append((time.monotonic() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2]


# --- H1: roll-only kernel: n_roll rolls of mixed shifts over (R, W) ---
def _roll_kernel(x_ref, o_ref, *, W, shifts):
    x = x_ref[:]
    acc = x
    for s in shifts:
        acc = acc + pltpu.roll(x, s % W, axis=1)
        x = acc
    o_ref[:] = acc


def roll_bench(R, W, shifts, rps=8):
    kern = partial(_roll_kernel, W=W, shifts=shifts)
    x = jnp.arange(R * W, dtype=jnp.int32).reshape(R, W)
    params = None
    if W * rps * 4 * 3 > 14 << 20:
        params = pltpu.CompilerParams(vmem_limit_bytes=100 << 20)
    f = jax.jit(
        lambda x: pl.pallas_call(
            kern,
            grid=(R // rps,),
            in_specs=[
                pl.BlockSpec((rps, W), lambda g: (g, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (rps, W), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((R, W), jnp.int32),
            **({"compiler_params": params} if params else {}),
        )(x)
    )
    ms = bench(f, x)
    lane_ops = R * W * len(shifts)
    return ms, ms * 1e6 / lane_ops  # ns per rolled lane


# --- H3: folded roll kernel: sublane-axis rolls on (R*W/512, 512) ---
def _fold_roll_kernel(x_ref, o_ref, *, n_roll, FW):
    x = x_ref[:]
    acc = x
    for i in range(n_roll):
        acc = acc + pltpu.roll(x, (i % 7) + 1, axis=0)
        x = acc
    o_ref[:] = acc


def fold_roll_bench(R, W, n_roll, FW=512, rps=8):
    rows = R * W // FW
    sub = rps * W // FW  # folded rows per step
    kern = partial(_fold_roll_kernel, n_roll=n_roll, FW=FW)
    x = jnp.arange(rows * FW, dtype=jnp.int32).reshape(rows, FW)
    f = jax.jit(
        lambda x: pl.pallas_call(
            kern,
            grid=(rows // sub,),
            in_specs=[
                pl.BlockSpec(
                    (sub, FW), lambda g: (g, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec(
                (sub, FW), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((rows, FW), jnp.int32),
        )(x)
    )
    ms = bench(f, x)
    lane_ops = rows * FW * n_roll
    return ms, ms * 1e6 / lane_ops


def main():
    print("backend:", jax.default_backend(), jax.devices())
    R = 64
    print("\n--- H1: lane-roll ns/lane vs width (small shifts 1..64) ---")
    small = [1, 2, 4, 8, 16, 32, 64]
    for W in (1024, 4096, 8192, 16384, 32768):
        ms, ns = roll_bench(R, W, small)
        print(f"W={W:6d} small-shift rolls: {ms:8.3f} ms  {ns:7.3f} ns/lane")
    print("--- H1b: large shifts (W/2, W/4, ..., 128) ---")
    for W in (1024, 4096, 8192, 16384, 32768):
        big = [W // 2, W // 4, W // 8, W // 16, 128, 256, 512]
        ms, ns = roll_bench(R, W, big)
        print(f"W={W:6d} large-shift rolls: {ms:8.3f} ms  {ns:7.3f} ns/lane")
    print("\n--- H3: folded sublane-axis rolls (FW=512) ---")
    for W in (4096, 8192, 16384, 32768):
        ms, ns = fold_roll_bench(R, W, 7)
        print(f"W={W:6d} folded rolls:      {ms:8.3f} ms  {ns:7.3f} ns/lane")

    print("\n--- production sdc ns/lane-op (model: lane_ops = W(L^2-L0^2)/2 + 3W log W) ---")
    from sparse_matrix_with_flops_tpu.ops.pallas_sort import sort_dedup_compact

    rng = np.random.default_rng(0)
    for W in (1024, 4096, 8192, 16384, 32768):
        tc = jnp.asarray(
            rng.integers(0, 50000, size=(R, W), dtype=np.int32)
        )
        tv = jnp.asarray(rng.random((R, W), dtype=np.float32))
        f = jax.jit(
            lambda tc, tv: sort_dedup_compact(tc, tv, 50000, presorted=1)
        )
        ms = bench(f, tc, tv)
        L = np.log2(W)
        lane_ops = R * (W * L * L / 2 + 3 * W * L)
        print(
            f"W={W:6d} sdc: {ms:8.3f} ms  {ms*1e6/lane_ops:7.3f} ns/lane-op"
        )


if __name__ == "__main__":
    main()
