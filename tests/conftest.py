"""Test configuration: force an 8-device virtual CPU platform.

Tests validate numerics and multi-chip sharding without TPU hardware; the
driver separately compile-checks the TPU path.  Must run before jax import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax may already be imported by interpreter startup hooks with a TPU
# platform; backends initialize lazily, so overriding the config here (before
# any device is touched) still lands tests on the virtual 8-device CPU.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    Every retained CPU executable holds mmap'd JIT code pages; across the
    full suite the process crosses vm.max_map_count (65530) and LLVM
    segfaults/aborts mid-compile (observed at ~150 tests in).  Clearing
    per module caps the map count; cross-module jit cache hits are rare
    (different shapes), so the time cost is noise."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_csr_np(rng, rows, cols, density, seed_vals=True):
    """Random host CSR triple (row_ptr, col, val) with ~density fill."""
    mask = rng.random((rows, cols)) < density
    counts = mask.sum(axis=1).astype(np.int32)
    row_ptr = np.zeros(rows + 1, dtype=np.int32)
    np.cumsum(counts, out=row_ptr[1:])
    r, c = np.nonzero(mask)
    v = rng.standard_normal(r.shape[0]).astype(np.float32) if seed_vals else np.ones(
        r.shape[0], np.float32
    )
    return row_ptr, c.astype(np.int32), v


@pytest.fixture
def random_csr():
    return random_csr_np
