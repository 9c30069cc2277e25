"""L0 utilities: timers/profiling spans, synthetic matrix generators,
permutation helpers."""

from .generate import banded_csr, rmat_csr
from .perm import permutation_transpose, random_permutation_vector
from .timing import Profiler, bench_fn, time_in_mill_now

__all__ = [
    "banded_csr",
    "rmat_csr",
    "permutation_transpose",
    "random_permutation_vector",
    "Profiler",
    "bench_fn",
    "time_in_mill_now",
]
