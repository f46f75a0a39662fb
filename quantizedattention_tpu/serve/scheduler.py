"""Continuous-batching scheduler: native C++ core with a pure-Python twin.

The C++ scheduler (native/scheduler.cpp, C ABI via ctypes — same build
pattern as the f64 oracle in reference/native_oracle.py) owns admission,
slot allocation and completion bookkeeping; the Python twin implements the
identical policy and doubles as both the no-compiler fallback and the
differential-testing oracle for the native one (tests/test_serving.py).

Policy (both implementations): FCFS; a waiting request is admitted the
moment a slot is free (prefill preferred over decode, keeping the decode
batch full); a request whose prompt_len + max_new_tokens exceeds the KV
capacity is rejected at submit.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from collections import deque
from dataclasses import dataclass

IDLE, PREFILL, DECODE = 0, 1, 2

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "scheduler.cpp")
_SO = os.path.join(_NATIVE_DIR, "libscheduler.so")
_lock = threading.Lock()
_lib = None


def _load():
    """Build (if needed) and load the native scheduler; raises on failure."""
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
        lib.qa_sched_create.restype = ctypes.c_void_p
        lib.qa_sched_create.argtypes = [ctypes.c_int32, ctypes.c_int32]
        lib.qa_sched_destroy.argtypes = [ctypes.c_void_p]
        lib.qa_sched_submit.restype = ctypes.c_int32
        lib.qa_sched_submit.argtypes = [ctypes.c_void_p] + [ctypes.c_int32] * 3
        lib.qa_sched_next.restype = ctypes.c_int32
        lib.qa_sched_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.qa_sched_report_token.restype = ctypes.c_int32
        lib.qa_sched_report_token.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
        lib.qa_sched_requeue.restype = ctypes.c_int32
        lib.qa_sched_requeue.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        for name in ("qa_sched_num_active", "qa_sched_num_waiting"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int32
            fn.argtypes = [ctypes.c_void_p]
        for name in ("qa_sched_num_completed", "qa_sched_num_rejected"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_void_p]
        lib.qa_sched_slot_request.restype = ctypes.c_int32
        lib.qa_sched_slot_request.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.qa_pager_create.restype = ctypes.c_void_p
        lib.qa_pager_create.argtypes = [ctypes.c_int32]
        lib.qa_pager_destroy.argtypes = [ctypes.c_void_p]
        lib.qa_pager_alloc.restype = ctypes.c_int32
        lib.qa_pager_alloc.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)
        ]
        lib.qa_pager_free.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)
        ]
        lib.qa_pager_num_free.restype = ctypes.c_int32
        lib.qa_pager_num_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeScheduler:
    """ctypes handle to the C++ scheduler."""

    def __init__(self, n_slots: int, max_len: int):
        self._lib = _load()
        self._h = self._lib.qa_sched_create(n_slots, max_len)
        if not self._h:
            raise ValueError(f"bad scheduler args: n_slots={n_slots} max_len={max_len}")

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.qa_sched_destroy(self._h)
            self._h = None

    def submit(self, request_id: int, prompt_len: int, max_new_tokens: int) -> bool:
        return self._lib.qa_sched_submit(self._h, request_id, prompt_len, max_new_tokens) == 0

    def next_action(self) -> tuple[int, int, int]:
        """-> (action, request_id, slot); request_id/slot are -1 unless PREFILL.

        Contract (the engine's batched-admission loop relies on it, and the
        C++ scheduler honors it): only a PREFILL return mutates scheduler
        state (pops the queue, binds a slot). DECODE/IDLE returns are pure
        reads — a caller may probe next_action and discard a non-PREFILL
        answer without losing anything.
        """
        req = ctypes.c_int32(-1)
        slot = ctypes.c_int32(-1)
        act = self._lib.qa_sched_next(self._h, ctypes.byref(req), ctypes.byref(slot))
        return act, req.value, slot.value

    def report_token(self, slot: int, is_eos: bool) -> bool:
        """True if the request in `slot` just finished (slot freed)."""
        r = self._lib.qa_sched_report_token(self._h, slot, int(is_eos))
        if r < 0:
            raise ValueError(f"report_token on free/invalid slot {slot}")
        return bool(r)

    def requeue(self, slot: int) -> None:
        """Undo an admission (engine could not serve it — e.g. page pool
        exhausted): request returns to the FRONT of the queue, slot frees."""
        if self._lib.qa_sched_requeue(self._h, slot) < 0:
            raise ValueError(f"requeue on free/invalid slot {slot}")

    @property
    def num_active(self) -> int:
        return self._lib.qa_sched_num_active(self._h)

    @property
    def num_waiting(self) -> int:
        return self._lib.qa_sched_num_waiting(self._h)

    @property
    def num_completed(self) -> int:
        return self._lib.qa_sched_num_completed(self._h)

    def slot_request(self, slot: int) -> int:
        return self._lib.qa_sched_slot_request(self._h, slot)


@dataclass
class _Slot:
    request_id: int = -1
    generated: int = 0
    max_new_tokens: int = 0
    prompt_len: int = 0


class PyScheduler:
    """Pure-Python twin of native/scheduler.cpp (identical policy)."""

    def __init__(self, n_slots: int, max_len: int):
        if n_slots <= 0 or max_len <= 0:
            raise ValueError(f"bad scheduler args: n_slots={n_slots} max_len={max_len}")
        self.max_len = max_len
        self._slots = [_Slot() for _ in range(n_slots)]
        self._waiting: deque = deque()
        self.num_completed = 0

    def submit(self, request_id: int, prompt_len: int, max_new_tokens: int) -> bool:
        if prompt_len <= 0 or max_new_tokens <= 0 or prompt_len + max_new_tokens > self.max_len:
            return False
        self._waiting.append((request_id, prompt_len, max_new_tokens))
        return True

    def next_action(self) -> tuple[int, int, int]:
        # Same contract as NativeScheduler.next_action: only PREFILL mutates.
        if self._waiting:
            for i, s in enumerate(self._slots):
                if s.request_id < 0:
                    rid, plen, mnt = self._waiting.popleft()
                    self._slots[i] = _Slot(rid, 0, mnt, plen)
                    return PREFILL, rid, i
        if self.num_active > 0:
            return DECODE, -1, -1
        return IDLE, -1, -1

    def report_token(self, slot: int, is_eos: bool) -> bool:
        s = self._slots[slot]
        if s.request_id < 0:
            raise ValueError(f"report_token on free slot {slot}")
        s.generated += 1
        if is_eos or s.generated >= s.max_new_tokens:
            self._slots[slot] = _Slot()
            self.num_completed += 1
            return True
        return False

    def requeue(self, slot: int) -> None:
        s = self._slots[slot]
        if s.request_id < 0:
            raise ValueError(f"requeue on free slot {slot}")
        self._waiting.appendleft((s.request_id, s.prompt_len, s.max_new_tokens))
        self._slots[slot] = _Slot()

    @property
    def num_active(self) -> int:
        return sum(s.request_id >= 0 for s in self._slots)

    @property
    def num_waiting(self) -> int:
        return len(self._waiting)

    def slot_request(self, slot: int) -> int:
        return self._slots[slot].request_id


class NativePager:
    """ctypes handle to the C++ page allocator (paged KV cache). Page 0 is
    the reserved null page — tables point unused slots at it."""

    def __init__(self, n_pages: int):
        self._lib = _load()
        self._h = self._lib.qa_pager_create(n_pages)
        if not self._h:
            raise ValueError(f"bad pager args: n_pages={n_pages}")

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.qa_pager_destroy(self._h)
            self._h = None

    def alloc(self, n: int) -> list[int] | None:
        """n page ids, or None if the pool can't cover it (all-or-nothing)."""
        out = (ctypes.c_int32 * n)()
        if self._lib.qa_pager_alloc(self._h, n, out) != n:
            return None
        return list(out)

    def free(self, pages) -> None:
        arr = (ctypes.c_int32 * len(pages))(*pages)
        self._lib.qa_pager_free(self._h, len(pages), arr)

    @property
    def num_free(self) -> int:
        return self._lib.qa_pager_num_free(self._h)


class PyPager:
    """Pure-Python twin of the native page allocator (same LIFO policy)."""

    def __init__(self, n_pages: int):
        if n_pages < 2:
            raise ValueError(f"bad pager args: n_pages={n_pages}")
        self.n_pages = n_pages
        self._free = list(range(n_pages - 1, 0, -1))  # page 0 reserved

    def alloc(self, n: int) -> list[int] | None:
        if n <= 0 or n > len(self._free):
            return None
        return [self._free.pop() for _ in range(n)]

    def free(self, pages) -> None:
        # ignore page 0, out-of-range ids, and double-frees (would alias one
        # page to two requests on the next alloc) — same policy as native
        live = set(self._free)
        for p in pages:
            if 1 <= p < self.n_pages and p not in live:
                self._free.append(p)
                live.add(p)

    @property
    def num_free(self) -> int:
        return len(self._free)


def make_pager(n_pages: int, prefer_native: bool = True):
    """Native page allocator when available, Python twin otherwise."""
    if prefer_native:
        try:
            return NativePager(n_pages)
        except (OSError, subprocess.CalledProcessError):
            pass
    return PyPager(n_pages)


def make_scheduler(n_slots: int, max_len: int, prefer_native: bool = True):
    """Native scheduler when g++/the .so is available, Python twin otherwise."""
    if prefer_native:
        try:
            return NativeScheduler(n_slots, max_len)
        except (OSError, subprocess.CalledProcessError):
            pass
    return PyScheduler(n_slots, max_len)
