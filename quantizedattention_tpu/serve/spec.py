"""Prompt-lookup speculative drafting (host-side policy).

Draft source for the engine's speculative decode mode (spec_decode=k):
the next k tokens are proposed by matching the sequence's own trailing
n-gram against earlier occurrences in prompt+generation — "prompt lookup
decoding". No draft model, no extra device work: proposals come from the
tokens the host already has, and the device-side verify step
(models/transformer.py:verify_step_batched) makes ANY draft content safe —
a wrong draft costs nothing beyond the work the step did anyway, a right
draft banks an extra token per position.

No reference counterpart (the reference has no serving layer, SURVEY.md
§1); greedy token-exactness is guaranteed by construction because every
draft token is checked against the model's own argmax before it counts.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
)
_SRC = os.path.join(_NATIVE_DIR, "ngram.cpp")
_SO = os.path.join(_NATIVE_DIR, "libngram.so")
_lock = threading.Lock()
_lib = None


def _load():
    """Build (if needed) and load the native proposer; raises on failure."""
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
        lib.qa_propose_lookup.restype = ctypes.c_int32
        lib.qa_propose_lookup.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def propose_lookup_native(
    history: list[int], k: int, max_ngram: int = 3, min_ngram: int = 1
) -> list[int]:
    """Native (C++, native/ngram.cpp) twin of `propose_lookup` — identical
    policy, loaded via ctypes; the Python version is its differential-test
    oracle. Raises OSError/CalledProcessError if g++/the .so is missing."""
    lib = _load()
    n = len(history)
    hist = (ctypes.c_int32 * max(n, 1))(*history)
    out = (ctypes.c_int32 * max(k, 1))()
    cnt = lib.qa_propose_lookup(hist, n, k, max_ngram, min_ngram, out)
    return list(out[:cnt])


def make_lookup(prefer_native: bool = True):
    """The proposer callable the engine drafts with: native when the
    toolchain allows (the proposer scans every slot's full history on the
    host critical path, once per speculative dispatch), Python otherwise."""
    if prefer_native:
        try:
            _load()
            return propose_lookup_native
        except (OSError, subprocess.CalledProcessError):
            pass
    return propose_lookup


def propose_lookup(
    history: list[int], k: int, max_ngram: int = 3, min_ngram: int = 1
) -> list[int]:
    """Propose up to k continuation tokens for `history` by n-gram lookup.

    Tries the longest trailing n-gram first (n = max_ngram .. min_ngram);
    for the first n with an earlier occurrence (most recent match wins),
    returns the tokens that followed it, truncated to k. Returns [] when
    nothing matches — the caller pads (padding is harmless: unverified
    drafts are simply rejected).
    """
    min_ngram = max(1, min_ngram)  # clamped identically in native/ngram.cpp
    if k < 1 or len(history) < min_ngram + 1:
        return []
    for n in range(min(max_ngram, len(history) - 1), min_ngram - 1, -1):
        suffix = history[-n:]
        # scan right-to-left over earlier windows (recency bias: the most
        # recent prior occurrence predicts the continuation best)
        for i in range(len(history) - n - 1, -1, -1):
            if history[i : i + n] == suffix:
                out = history[i + n : i + n + k]
                if out:
                    return out
    return []
