"""ctypes bindings for the native C++ setup kernels (native/libamgsetup.so).

The library is built by `make -C native` (g++, no external deps); if it is
missing, an automatic one-shot build is attempted, and on any failure the
callers silently fall back to the scipy implementations — the native path is
a performance backend, not a semantic one (results are tested equal).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libamgsetup.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False

_i32p = ctypes.POINTER(ctypes.c_int32)
_f64p = ctypes.POINTER(ctypes.c_double)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.join(_REPO_ROOT, "native")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.spgemm_csr.restype = ctypes.c_int64
    lib.spgemm_csr.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        _i32p, _i32p, _f64p,
        _i32p, _i32p, _f64p,
        ctypes.POINTER(_i32p), ctypes.POINTER(_i32p), ctypes.POINTER(_f64p),
    ]
    lib.csr_transpose.restype = None
    lib.csr_transpose.argtypes = [
        ctypes.c_int32, ctypes.c_int32, _i32p, _i32p, _f64p,
        _i32p, _i32p, _f64p,
    ]
    lib.pmis_coarsen.restype = None
    lib.pmis_coarsen.argtypes = [
        ctypes.c_int32, _i32p, _i32p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int8),
    ]
    lib.hmis_coarsen.restype = None
    lib.hmis_coarsen.argtypes = lib.pmis_coarsen.argtypes
    lib.amg_free.restype = None
    lib.amg_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def _as_f64(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def _ptr(a, typ):
    return a.ctypes.data_as(typ)


def spgemm(a_indptr, a_indices, a_data, b_indptr, b_indices, b_data, shape_a, shape_b):
    """C = A @ B. Returns (indptr, indices, data) numpy arrays (copies)."""
    lib = _load()
    assert lib is not None
    m, k = shape_a
    k2, n = shape_b
    assert k == k2
    ai, aj, av = _as_i32(a_indptr), _as_i32(a_indices), _as_f64(a_data)
    bi, bj, bv = _as_i32(b_indptr), _as_i32(b_indices), _as_f64(b_data)
    ci = _i32p()
    cj = _i32p()
    cv = _f64p()
    nnz = lib.spgemm_csr(
        m, k, n,
        _ptr(ai, _i32p), _ptr(aj, _i32p), _ptr(av, _f64p),
        _ptr(bi, _i32p), _ptr(bj, _i32p), _ptr(bv, _f64p),
        ctypes.byref(ci), ctypes.byref(cj), ctypes.byref(cv),
    )
    try:
        indptr = np.ctypeslib.as_array(ci, shape=(m + 1,)).copy()
        indices = np.ctypeslib.as_array(cj, shape=(max(nnz, 1),))[:nnz].copy()
        data = np.ctypeslib.as_array(cv, shape=(max(nnz, 1),))[:nnz].copy()
    finally:
        lib.amg_free(ci)
        lib.amg_free(cj)
        lib.amg_free(cv)
    return indptr, indices, data


def transpose(indptr, indices, data, shape):
    lib = _load()
    assert lib is not None
    m, n = shape
    ai, aj, av = _as_i32(indptr), _as_i32(indices), _as_f64(data)
    nnz = int(ai[m])
    bi = np.zeros(n + 1, dtype=np.int32)
    bj = np.zeros(max(nnz, 1), dtype=np.int32)
    bv = np.zeros(max(nnz, 1), dtype=np.float64)
    lib.csr_transpose(
        m, n, _ptr(ai, _i32p), _ptr(aj, _i32p), _ptr(av, _f64p),
        _ptr(bi, _i32p), _ptr(bj, _i32p), _ptr(bv, _f64p),
    )
    return bi, bj[:nnz], bv[:nnz]


def pmis(s_indptr, s_indices, n, seed: int = 0):
    lib = _load()
    assert lib is not None
    si, sj = _as_i32(s_indptr), _as_i32(s_indices)
    cf = np.zeros(n, dtype=np.int8)
    lib.pmis_coarsen(
        n, _ptr(si, _i32p), _ptr(sj, _i32p), ctypes.c_uint64(seed),
        cf.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    return cf


def _bind_interp(lib, name):
    fn = getattr(lib, name)
    fn.restype = ctypes.c_int64
    fn.argtypes = [
        ctypes.c_int32, ctypes.c_int32,
        _i32p, _i32p, _f64p,
        _i32p, _i32p,
        ctypes.POINTER(ctypes.c_int8), _i32p,
        ctypes.POINTER(_i32p), ctypes.POINTER(_i32p), ctypes.POINTER(_f64p),
    ]
    return fn


def interpolation(kind, a_indptr, a_indices, a_data, s_indptr, s_indices, cf, cmap, n, nc):
    """kind: 'direct' | 'ext+i'. Returns (indptr, indices, data)."""
    lib = _load()
    assert lib is not None
    fn = _bind_interp(lib, "interp_direct" if kind == "direct" else "interp_extpi")
    ai, aj, av = _as_i32(a_indptr), _as_i32(a_indices), _as_f64(a_data)
    si, sj = _as_i32(s_indptr), _as_i32(s_indices)
    cfa = np.ascontiguousarray(cf, dtype=np.int8)
    cm = _as_i32(cmap)
    pi = _i32p()
    pj = _i32p()
    pv = _f64p()
    nnz = fn(
        n, nc,
        _ptr(ai, _i32p), _ptr(aj, _i32p), _ptr(av, _f64p),
        _ptr(si, _i32p), _ptr(sj, _i32p),
        cfa.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), _ptr(cm, _i32p),
        ctypes.byref(pi), ctypes.byref(pj), ctypes.byref(pv),
    )
    try:
        indptr = np.ctypeslib.as_array(pi, shape=(n + 1,)).copy()
        indices = np.ctypeslib.as_array(pj, shape=(max(nnz, 1),))[:nnz].copy()
        data = np.ctypeslib.as_array(pv, shape=(max(nnz, 1),))[:nnz].copy()
    finally:
        lib.amg_free(pi)
        lib.amg_free(pj)
        lib.amg_free(pv)
    return indptr, indices, data


def hmis(s_indptr, s_indices, n, seed: int = 0):
    lib = _load()
    assert lib is not None
    si, sj = _as_i32(s_indptr), _as_i32(s_indices)
    cf = np.zeros(n, dtype=np.int8)
    lib.hmis_coarsen(
        n, _ptr(si, _i32p), _ptr(sj, _i32p), ctypes.c_uint64(seed),
        cf.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    return cf
