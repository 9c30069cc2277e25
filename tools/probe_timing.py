"""Probe: does block_until_ready actually block through the axon tunnel?

Round-1 measured a ~40ms dispatch floor with block_until_ready-based
timing; a fresh probe shows 512MB 'copied' in 0.17ms, which is impossible
(3TB/s > HBM).  This probe compares three completion signals on the same
op at two sizes:

  bur     — jax.block_until_ready(out)
  fetch   — np.asarray(checksum) where the jitted fn also returns a scalar
            checksum (forces device completion + one host transfer)
  item    — float(out[0,0]) on the large output

If bur-time is flat across sizes while fetch-time scales, bur is async
through the tunnel and all timing must go through fetch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    @jax.jit
    def heavy(x):
        # data-dependent chain of matmuls: not elidable, not cacheable
        for _ in range(4):
            x = jnp.tanh(x @ x)
        return x, jnp.sum(x)

    for n in (1024, 4096):
        x = jnp.asarray(rng.random((n, n)).astype(np.float32))
        # warmup
        out, chk = heavy(x)
        np.asarray(chk)
        for mode in ("bur", "fetch", "item"):
            ts = []
            for _ in range(3):
                t0 = time.monotonic()
                out, chk = heavy(x)
                if mode == "bur":
                    jax.block_until_ready(out)
                elif mode == "fetch":
                    np.asarray(chk)
                else:
                    float(out[0, 0])
                ts.append((time.monotonic() - t0) * 1e3)
            ts.sort()
            print(f"n={n} {mode:6s} {ts[1]:9.2f} ms", flush=True)

    # dispatch floor via fetch
    @jax.jit
    def tiny(x):
        return x + 1.0, jnp.sum(x)

    x = jnp.zeros((8, 128), jnp.float32)
    out, chk = tiny(x)
    np.asarray(chk)
    ts = []
    for _ in range(5):
        t0 = time.monotonic()
        out, chk = tiny(x)
        np.asarray(chk)
        ts.append((time.monotonic() - t0) * 1e3)
    ts.sort()
    print(f"dispatch+fetch floor: {ts[2]:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
