"""ctypes bindings for the native C++ loader (native/src/loader.cc).

The shared library is built on demand with g++ (no pybind11 in the image;
C ABI + ctypes instead).  Falls back silently to the pure-Python readers
when the toolchain or the build is unavailable — the native path is a
loader for big corpora, not a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _build_lib(src: str, out: str, extra: tuple = ()) -> bool:
    # Compile to a process-unique path and publish atomically: the
    # in-process lock cannot stop a SECOND process (parallel pytest,
    # multi-host launch) from racing g++ on the same -o target, and a
    # partially written .so must never be dlopen-able.
    tmp = f"{out}.{os.getpid()}.tmp"
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        *extra,
        "-o",
        tmp,
        src,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native loader; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        src = os.path.join(pkg, "native", "src", "loader.cc")
        out = os.path.join(pkg, "native", "_loader.so")
        if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
            if not _build_lib(src, out):
                return None
        try:
            lib = ctypes.CDLL(out)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.smf_read_graph.restype = ctypes.c_int
        lib.smf_read_graph.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(i32p),
            ctypes.POINTER(i32p),
            ctypes.POINTER(f32p),
            i64p,
            i64p,
            i64p,
        ]
        lib.smf_coo_to_csr.restype = ctypes.c_int
        lib.smf_coo_to_csr.argtypes = [
            i32p,
            i32p,
            f32p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(i32p),
            ctypes.POINTER(i32p),
            ctypes.POINTER(f32p),
            i64p,
        ]
        lib.smf_free.restype = None
        lib.smf_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


_BASE_LIB: ctypes.CDLL | None = None
_BASE_TRIED = False


def get_baseline_lib() -> ctypes.CDLL | None:
    """Multi-threaded CPU Gustavson baseline (spgemm_baseline.cc), built
    with OpenMP on demand; None if the toolchain is unavailable."""
    global _BASE_LIB, _BASE_TRIED
    with _LOCK:
        if _BASE_LIB is not None or _BASE_TRIED:
            return _BASE_LIB
        _BASE_TRIED = True
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        src = os.path.join(pkg, "native", "src", "spgemm_baseline.cc")
        out = os.path.join(pkg, "native", "_baseline.so")
        if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
            if not _build_lib(src, out, extra=("-fopenmp",)):
                return None
        try:
            lib = ctypes.CDLL(out)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.smf_spgemm_mt.restype = ctypes.c_int
        lib.smf_spgemm_mt.argtypes = [
            i32p, i32p, f32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, f32p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _BASE_LIB = lib
        return _BASE_LIB


def spgemm_mt_baseline(rp, ci, v, ncols: int, iters: int = 5):
    """(best ms, nnzc) of C = A·A via the OpenMP Gustavson baseline, or
    None when the native toolchain is unavailable.  ``rp/ci/v`` are host
    CSR arrays of the square matrix A."""
    lib = get_baseline_lib()
    if lib is None:
        return None
    rp = np.ascontiguousarray(rp, dtype=np.int32)
    nnz = int(rp[-1])
    ci = np.ascontiguousarray(ci[:nnz], dtype=np.int32)
    v = np.ascontiguousarray(v[:nnz], dtype=np.float32)
    m = rp.shape[0] - 1
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    ms = ctypes.c_double()
    nnzc = ctypes.c_int64()
    rc = lib.smf_spgemm_mt(
        rp.ctypes.data_as(i32p), ci.ctypes.data_as(i32p),
        v.ctypes.data_as(f32p),
        m, m, ncols,
        rp.ctypes.data_as(i32p), ci.ctypes.data_as(i32p),
        v.ctypes.data_as(f32p),
        iters, ctypes.byref(ms), ctypes.byref(nnzc),
    )
    if rc != 0:
        return None
    return float(ms.value), int(nnzc.value)


def _steal(lib, ptr, n, dtype):
    """Copy a malloc'd buffer into numpy and free it."""
    ct = ctypes.c_int32 if dtype == np.int32 else ctypes.c_float
    arr = np.ctypeslib.as_array(
        ctypes.cast(ptr, ctypes.POINTER(ct)), shape=(max(n, 1),)
    )[:n].copy()
    lib.smf_free(ptr)
    return arr.astype(dtype, copy=False)


def read_graph_native(path: str, is_trans: bool = True):
    """(row, col, val, nrows, ncols) via the C++ parser, or None."""
    lib = get_lib()
    if lib is None:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    orow, ocol, oval = i32p(), i32p(), f32p()
    nnz = ctypes.c_int64()
    nr = ctypes.c_int64()
    nc = ctypes.c_int64()
    rc = lib.smf_read_graph(
        path.encode(),
        int(is_trans),
        ctypes.byref(orow),
        ctypes.byref(ocol),
        ctypes.byref(oval),
        ctypes.byref(nnz),
        ctypes.byref(nr),
        ctypes.byref(nc),
    )
    if rc != 0:
        return None
    n = nnz.value
    row = _steal(lib, orow, n, np.int32)
    col = _steal(lib, ocol, n, np.int32)
    val = _steal(lib, oval, n, np.float32)
    return row, col, val, int(nr.value), int(nc.value)


def coo_to_csr_native(row, col, val, nrows: int):
    """(row_ptr, col, val) sorted/dedup'd CSR via C++, or None."""
    lib = get_lib()
    if lib is None:
        return None
    row = np.ascontiguousarray(row, dtype=np.int32)
    col = np.ascontiguousarray(col, dtype=np.int32)
    val = np.ascontiguousarray(val, dtype=np.float32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    orp, ocol, oval = i32p(), i32p(), f32p()
    onnz = ctypes.c_int64()
    rc = lib.smf_coo_to_csr(
        row.ctypes.data_as(i32p),
        col.ctypes.data_as(i32p),
        val.ctypes.data_as(f32p),
        row.shape[0],
        nrows,
        ctypes.byref(orp),
        ctypes.byref(ocol),
        ctypes.byref(oval),
        ctypes.byref(onnz),
    )
    if rc != 0:
        return None
    n = onnz.value
    rp = _steal(lib, orp, nrows + 1, np.int32)
    c = _steal(lib, ocol, n, np.int32)
    v = _steal(lib, oval, n, np.float32)
    return rp, c, v
