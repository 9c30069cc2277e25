"""Isolate the assembly window-gather cost (s14-shaped: nnz(C)~7.8M,
61k unaligned 128-wide windows out of a ~10M-element flat stream).

Variants slope-timed:
  take-roll     two aligned row takes + log-128 roll-select (committed)
  gather-slice  lax.gather with slice_sizes=(128,) at unaligned starts
  gather-2d     lax.gather on the [nr, 2W] pair array, slice (2, 2W), roll
  dynslice-scan lax.scan of dynamic_slice windows (serial baseline)

Usage: python tools/probe_wingather.py [total] [W]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sparse_matrix_with_flops_tpu.ops.ell_esc import _roll_sel
    from sparse_matrix_with_flops_tpu.utils.timing import slope_bench

    total = int(sys.argv[1]) if len(sys.argv) > 1 else 7_800_000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    rng = np.random.default_rng(0)
    tpad = -(-total // W) * W + 2 * W
    fc = jnp.asarray(rng.integers(0, 16384, tpad).astype(np.int32))
    fv = jnp.asarray(rng.random(tpad).astype(np.float32))
    nq = total // W  # windows
    p0_np = np.sort(rng.integers(0, total - W, nq)).astype(np.int32)
    p0 = jnp.asarray(p0_np)
    print(
        f"backend={jax.default_backend()} total={total} W={W} nq={nq}",
        flush=True,
    )

    src = jnp.concatenate(
        [
            fc.reshape(-1, W),
            jax.lax.bitcast_convert_type(fv, jnp.int32).reshape(-1, W),
        ],
        axis=1,
    )
    nr = src.shape[0]

    def take_roll(x):
        p = p0 + x.astype(jnp.int32)
        wr = jnp.clip(p // W, 0, nr - 2)
        off = jnp.clip(p - wr * W, 0, W - 1)
        g = jnp.concatenate(
            [jnp.take(src, wr, axis=0), jnp.take(src, wr + 1, axis=0)],
            axis=1,
        )
        gc = jnp.concatenate([g[:, :W], g[:, 2 * W : 3 * W]], axis=1)
        gv = jnp.concatenate([g[:, W : 2 * W], g[:, 3 * W :]], axis=1)
        gc = _roll_sel(gc, off, W)[:, :W]
        gv = _roll_sel(gv, off, W)[:, :W]
        return jnp.sum(gc) + jnp.sum(
            jax.lax.bitcast_convert_type(gv, jnp.float32)
        )

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )

    def gather_slice(x):
        p = (p0 + x.astype(jnp.int32))[:, None]
        gc = jax.lax.gather(
            fc, p, dnums, slice_sizes=(W,), mode="clip"
        )
        gv = jax.lax.gather(
            fv, p, dnums, slice_sizes=(W,), mode="clip"
        )
        return jnp.sum(gc) + jnp.sum(gv)

    dnums2 = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )

    def gather_2d(x):
        p = p0 + x.astype(jnp.int32)
        wr = jnp.clip(p // W, 0, nr - 2)
        off = jnp.clip(p - wr * W, 0, W - 1)
        g = jax.lax.gather(
            src, wr[:, None], dnums2, slice_sizes=(2, 2 * W), mode="clip"
        )  # [nq, 2, 2W]
        gc = jnp.concatenate([g[:, 0, :W], g[:, 1, :W]], axis=1)
        gv = jnp.concatenate([g[:, 0, W:], g[:, 1, W:]], axis=1)
        gc = _roll_sel(gc, off, W)[:, :W]
        gv = _roll_sel(gv, off, W)[:, :W]
        return jnp.sum(gc) + jnp.sum(
            jax.lax.bitcast_convert_type(gv, jnp.float32)
        )

    # (historical: a VMEM align kernel measured 5.01 ms here — beaten
    # 3.7x by gather-slice and removed; see docs/ROOFLINE.md)

    def gather_slice_arrays(x):
        """Same as gather_slice but materializing the full [nq, W]
        outputs (production consumes them downstream) instead of
        reducing to a scalar inside the fused computation."""
        p = (p0 + x.astype(jnp.int32))[:, None]
        gc = jax.lax.gather(fc, p, dnums, slice_sizes=(W,), mode="clip")
        gv = jax.lax.gather(fv, p, dnums, slice_sizes=(W,), mode="clip")
        return gc, gv

    def take2_only(x):
        """Gather movement floor: two takes, no alignment."""
        p = p0 + x.astype(jnp.int32)
        wr = jnp.clip(p // W, 0, nr - 2)
        g0 = jnp.take(src, wr, axis=0)
        g1 = jnp.take(src, wr + 1, axis=0)
        return jnp.sum(g0) + jnp.sum(g1)

    def take1_only(x):
        p = p0 + x.astype(jnp.int32)
        wr = jnp.clip(p // W, 0, nr - 2)
        g0 = jnp.take(src, wr, axis=0)
        return jnp.sum(g0)

    for name, fn in [
        ("take-roll", take_roll),
        ("gather-slice", gather_slice),
        ("gather-2d", gather_2d),
        ("gather-slice-arr", gather_slice_arrays),
        ("take2-only", take2_only),
        ("take1-only", take1_only),
    ]:
        try:
            ms = slope_bench(fn, ks=(1, 5))
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        print(f"{name:14s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
