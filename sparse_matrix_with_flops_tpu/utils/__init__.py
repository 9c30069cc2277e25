"""L0 utilities: timers/profiling spans, synthetic matrix generators."""

from .generate import banded_csr, rmat_csr
from .timing import Profiler, bench_fn, time_in_mill_now

__all__ = [
    "banded_csr",
    "rmat_csr",
    "Profiler",
    "bench_fn",
    "time_in_mill_now",
]
