"""Native C++ prefix store vs the Python twin (differential test — the
serve/scheduler.py convention: identical policy, the twin is the oracle)."""

import random

import pytest

from quantizedattention_tpu.serve.prefix_store import (
    NativePrefixStore,
    PyPrefixStore,
    make_prefix_store,
)


def _native_or_skip(ps):
    try:
        return NativePrefixStore(ps)
    except Exception as e:  # no g++ in env
        pytest.skip(f"native prefix store unavailable: {e}")


def test_native_basic_chain():
    st = _native_or_skip(4)
    prompt = list(range(11))
    assert st.register(prompt, [7, 8, 9]) == [7, 8]
    assert st.lookup(prompt) == [7, 8]
    assert st.lookup(prompt[:7]) == [7]
    assert st.refcount(7) == 1 and st.refcount(99) == -1
    st.release([7, 8])
    assert st.n_evictable == 1  # leaf only
    assert st.evict(4) == [8, 7]
    assert st.n_nodes == 0
    assert st.hits >= 3 and st.misses >= 0


def test_native_acquire_unknown_page_raises():
    st = _native_or_skip(4)
    st.register(list(range(4)), [1])
    with pytest.raises(ValueError):
        st.acquire([1, 999])


def test_make_prefix_store_prefers_native():
    st = make_prefix_store(4, prefer_native=True)
    # native when buildable, twin otherwise — both satisfy the same API
    assert hasattr(st, "lookup") and hasattr(st, "evict")
    st2 = make_prefix_store(4, prefer_native=False)
    assert isinstance(st2, PyPrefixStore)


def test_native_matches_python_randomized():
    """Mirror a random op stream on both stores; every return value and
    every observable (nodes, evictable, refcounts) must match exactly.
    Policy determinism (monotone LRU clock bumped identically) makes even
    eviction order comparable."""
    nat = _native_or_skip(4)
    py = PyPrefixStore(4)
    rng = random.Random(7)
    prompts = [[rng.randrange(6) for _ in range(rng.randrange(4, 30))]
               for _ in range(10)]
    next_page = [1]
    held_py: list[list[int]] = []

    def fresh(n):
        out = list(range(next_page[0], next_page[0] + n))
        next_page[0] += n
        return out

    for step in range(600):
        op = rng.random()
        prompt = rng.choice(prompts)
        if op < 0.35:
            cap = rng.randrange(0, 6)
            assert py.lookup(prompt, max_pages=cap) == nat.lookup(prompt, max_pages=cap)
        elif op < 0.6:
            n_full = len(prompt) // 4
            hit_py = py.lookup(prompt, max_pages=n_full)
            hit_nat = nat.lookup(prompt, max_pages=n_full)
            assert hit_py == hit_nat
            py.acquire(hit_py)
            nat.acquire(hit_nat)
            row = hit_py + fresh(n_full - len(hit_py) + 1)
            owned_py = py.register(prompt, row)
            owned_nat = nat.register(prompt, row)
            assert owned_py == owned_nat
            held_py.append(owned_py)
        elif op < 0.85 and held_py:
            owned = held_py.pop(rng.randrange(len(held_py)))
            py.release(owned)
            nat.release(owned)
        else:
            n = rng.randrange(1, 5)
            assert py.evict(n) == nat.evict(n)
        assert py.n_nodes == nat.n_nodes
        assert py.n_evictable == nat.n_evictable
        assert py.hits == nat.hits and py.misses == nat.misses
        for page in rng.sample(range(1, max(2, next_page[0])),
                               min(8, next_page[0] - 1)):
            assert py.refcount(page) == nat.refcount(page)
