"""ICI cost model for the ring exchanges (VERDICT r2 #4).

One physical chip means comm/compute overlap cannot be measured here;
what CAN be computed exactly is the per-step ICI byte volume of each
ring exchange (it is a plan constant) and, against the measured
single-chip compute rates, the predicted weak-scaling efficiency at v5e
ICI bandwidth under the two bounding assumptions:

  overlapped:  eff = compute / max(compute, comm)   (XLA async ppermute)
  serialized:  eff = compute / (compute + comm)     (worst case)

v5e ICI: 2-D torus, ~45 GB/s per link per direction (scaling-book
number); a ring over one axis uses one link pair, so per-step transfer
time = bytes_per_step / 45e9.  Results go in docs/ROOFLINE.md.

Usage: python tools/ici_model.py [scale] [S] [D ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ICI_BW = 45e9  # bytes/s per link per direction, v5e


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # pure host arithmetic

    from sparse_matrix_with_flops_tpu.utils.generate import rmat_csr

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    ds = [int(x) for x in sys.argv[3:]] or [2, 4, 8, 16]

    a = rmat_csr(scale, edge_factor=8, seed=7, weights="random")
    n = a.rows
    nnz = int(a.nnz)
    # measured single-chip anchors (slope-timed, docs/ROOFLINE.md r3):
    # fused SpGEMM s14 = 46 ms for 2*17.0M flops -> per-flop rate;
    # R-MCL ELL iteration ~ same pipeline class.  Scale compute by flops.
    from sparse_matrix_with_flops_tpu.ops.spgemm import spgemm_upper_bounds

    oflops, _ = spgemm_upper_bounds(a, a)
    SPGEMM_MS = 46.0 * (oflops / 17.0e6)  # s14 anchor, linear in flops

    print(f"s={scale} n={n} nnz={nnz} S={S} oflops={int(oflops)}")
    print(f"single-chip SpGEMM anchor: {SPGEMM_MS:.1f} ms")
    print()
    print("R-MCL ELL ring (iterate blocks rotate, lr x S x 8B per step):")
    for d in ds:
        lr = -(-n // d)
        bytes_step = 8 * lr * S
        comm_ms = bytes_step / ICI_BW * 1e3
        comp_ms = SPGEMM_MS / d / d  # per-chip work / D steps
        ov = comp_ms / max(comp_ms, comm_ms)
        sz = comp_ms / (comp_ms + comm_ms)
        print(
            f"  D={d:3d}: {bytes_step/1e6:7.2f} MB/step, comm "
            f"{comm_ms*1e3:7.1f} us/step, compute {comp_ms*1e3:8.1f} "
            f"us/step -> eff overlapped {ov*100:5.1f}%, serialized "
            f"{sz*100:5.1f}%"
        )
    print()
    print("SpGEMM ring (B blocks rotate, ~2 nnz(B)/D x 4B x 2 per step):")
    for d in ds:
        lcap = -(-nnz // d)  # balanced local capacity
        lr = -(-n // d)
        bytes_step = 4 * (2 * lcap + lr + 1)
        comm_ms = bytes_step / ICI_BW * 1e3
        comp_ms = SPGEMM_MS / d / d
        ov = comp_ms / max(comp_ms, comm_ms)
        sz = comp_ms / (comp_ms + comm_ms)
        print(
            f"  D={d:3d}: {bytes_step/1e6:7.2f} MB/step, comm "
            f"{comm_ms*1e3:7.1f} us/step, compute {comp_ms*1e3:8.1f} "
            f"us/step -> eff overlapped {ov*100:5.1f}%, serialized "
            f"{sz*100:5.1f}%"
        )


if __name__ == "__main__":
    main()
