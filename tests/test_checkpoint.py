"""Checkpoint/resume: interrupted R-MCL equals uninterrupted."""

import numpy as np

from sparse_matrix_with_flops_tpu.io import load_coo
from sparse_matrix_with_flops_tpu.models.checkpoint import (
    load_checkpoint,
    rmcl_resumable,
    save_checkpoint,
)
from sparse_matrix_with_flops_tpu.models.rmcl import rmcl, rmcl_init


def test_save_load_roundtrip(tmp_path):
    graph = load_coo("tests/tdatas/tdata.snap", extra_capacity=16)
    mt = rmcl_init(graph)
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, mt, 3, extra={"note": 42})
    back, it, extra = load_checkpoint(p)
    assert it == 3
    assert int(extra["note"]) == 42
    assert bool(back.is_equal(mt))


def test_resume_matches_straight_run(tmp_path):
    graph = load_coo("tests/tdatas/tdata.snap", extra_capacity=16)
    mt0 = rmcl_init(graph)
    ref = rmcl(mt0, max_iters=4, mode="loop")

    p = str(tmp_path / "ck.npz")
    # run 2 iterations, "crash", resume for the rest
    rmcl_resumable(mt0, max_iters=2, checkpoint_path=p)
    mt, it, _ = load_checkpoint(p), None, None
    final, iters, _ = rmcl_resumable(mt0, max_iters=4, checkpoint_path=p)
    assert iters == 4
    a = final.make_ordered()._drop_explicit_zeros()
    b = ref.mt.make_ordered()._drop_explicit_zeros()
    assert bool(a.is_raw_equal(b, tol=1e-5))
