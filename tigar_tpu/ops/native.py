"""ctypes bindings for the native preprocessing kernels.

The shared library is compiled on first use with g++ (cached next to the
source); every entry point has a vectorized numpy fallback, so the native
path is an optimization, never a requirement.  Disable with TIGAR_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_LIB = None
_TRIED = False


def _source_dir():
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native")


def _build():
    src = os.path.join(_source_dir(), "basis_kernel.cpp")
    out = os.path.join(_source_dir(), "libtigar_basis.so")
    if (os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(src)):
        return out
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-fopenmp", src, "-o", out]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("TIGAR_NATIVE", "1") == "0":
        return None
    try:
        path = _build()
        lib = ctypes.CDLL(path)
        lib.bspline_basis_ders.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_long),
            ctypes.c_long, ctypes.c_long, ctypes.POINTER(ctypes.c_double)]
        lib.extraction_apply.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double)]
        _LIB = lib
    except Exception as e:  # no toolchain, sandboxed, etc.
        print(f"tigar_tpu: native kernel unavailable ({e}); "
              "using numpy fallback", file=sys.stderr)
        _LIB = None
    return _LIB


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def bspline_basis_ders_native(ghost_knots, n_ghost, p, u, span, nders):
    """Native batched Cox-de Boor; returns None if the library is missing."""
    lib = get_lib()
    if lib is None:
        return None
    u = np.ascontiguousarray(u, dtype=np.float64)
    span = np.ascontiguousarray(span, dtype=np.int64)
    gk = np.ascontiguousarray(ghost_knots, dtype=np.float64)
    n = len(u)
    out = np.zeros((n, nders + 1, p + 1))
    lib.bspline_basis_ders(
        _ptr(gk), int(n_ghost), int(p), _ptr(u),
        span.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n, int(nders), _ptr(out))
    return out


def extraction_apply_native(C, bern):
    """Native batched extraction application C[e,a,b] @ bern[q,b];
    returns None if the library is missing."""
    lib = get_lib()
    if lib is None:
        return None
    C = np.ascontiguousarray(C, dtype=np.float64)
    bern = np.ascontiguousarray(bern, dtype=np.float64)
    nel, nshl, nbern = C.shape
    nq = bern.shape[0]
    out = np.zeros((nel, nq, nshl))
    lib.extraction_apply(_ptr(C), _ptr(bern), nel, nshl, nbern, nq,
                         _ptr(out))
    return out
