"""ctypes loader for native/prefix_store.cpp (build-on-demand, same
pattern as serve/scheduler.py: g++ -O2 -shared -fPIC, no pybind11)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "prefix_store.cpp")
_SO = os.path.join(_NATIVE_DIR, "libprefix_store.so")
_lock = threading.Lock()
_lib = None


def load():
    """Build (if needed) and load the native prefix store; raises on failure."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        i32, i64, p = ctypes.c_int32, ctypes.c_int64, ctypes.c_void_p
        ip = ctypes.POINTER(i32)
        lib.qa_pstore_create.restype = p
        lib.qa_pstore_create.argtypes = [i32]
        lib.qa_pstore_destroy.argtypes = [p]
        lib.qa_pstore_lookup.restype = i32
        lib.qa_pstore_lookup.argtypes = [p, ip, i32, i32, ip]
        lib.qa_pstore_acquire.restype = i32
        lib.qa_pstore_acquire.argtypes = [p, i32, ip]
        lib.qa_pstore_release.restype = None
        lib.qa_pstore_release.argtypes = [p, i32, ip]
        lib.qa_pstore_register.restype = i32
        lib.qa_pstore_register.argtypes = [p, ip, i32, i32, ip, ip]
        lib.qa_pstore_evict.restype = i32
        lib.qa_pstore_evict.argtypes = [p, i32, ip]
        lib.qa_pstore_num_nodes.restype = i32
        lib.qa_pstore_num_nodes.argtypes = [p]
        lib.qa_pstore_num_evictable.restype = i32
        lib.qa_pstore_num_evictable.argtypes = [p]
        lib.qa_pstore_hits.restype = i64
        lib.qa_pstore_hits.argtypes = [p]
        lib.qa_pstore_misses.restype = i64
        lib.qa_pstore_misses.argtypes = [p]
        lib.qa_pstore_refcount.restype = i32
        lib.qa_pstore_refcount.argtypes = [p, i32]
        _lib = lib
        return _lib
