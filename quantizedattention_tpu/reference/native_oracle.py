"""ctypes loader for the C++ float64 oracle (native/oracle.cpp).

Built on demand with g++ (no pybind11 in this environment — plain C ABI via
ctypes). The .so is cached next to the source; if no compiler is available
the loader raises and tests skip.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "oracle.cpp")
_SO = os.path.join(_NATIVE_DIR, "liboracle.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(_SO)
    dptr = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.c_int64
    lib.attention_fwd_f64.argtypes = [dptr] * 4 + [i64] * 5 + [ctypes.c_int, ctypes.c_double]
    lib.attention_fwd_f64.restype = None
    lib.attention_bwd_f64.argtypes = [dptr] * 7 + [i64] * 5 + [ctypes.c_int, ctypes.c_double]
    lib.attention_bwd_f64.restype = None
    _lib = lib
    return lib


def _as_c(x):
    return np.ascontiguousarray(x, dtype=np.float64)


def _ptr(x):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def native_attention_fwd(q, k, v, causal: bool = False, sm_scale: float | None = None):
    """float64 softmax attention via the C++ oracle; numpy in/out."""
    lib = _load()
    q, k, v = _as_c(q), _as_c(k), _as_c(v)
    b, h, tq, d = q.shape
    tk = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(d))
    o = np.empty_like(q)
    lib.attention_fwd_f64(
        _ptr(q), _ptr(k), _ptr(v), _ptr(o),
        b, h, tq, tk, d, int(causal), float(sm_scale),
    )
    return o


def native_attention_bwd(q, k, v, do, causal: bool = False, sm_scale: float | None = None):
    """float64 analytic (dq, dk, dv) via the C++ oracle; numpy in/out."""
    lib = _load()
    q, k, v, do = _as_c(q), _as_c(k), _as_c(v), _as_c(do)
    b, h, tq, d = q.shape
    tk = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(d))
    dq, dk, dv = np.empty_like(q), np.empty_like(k), np.empty_like(v)
    lib.attention_bwd_f64(
        _ptr(q), _ptr(k), _ptr(v), _ptr(do), _ptr(dq), _ptr(dk), _ptr(dv),
        b, h, tq, tk, d, int(causal), float(sm_scale),
    )
    return dq, dk, dv
