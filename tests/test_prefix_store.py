"""Unit tests for the prefix-store policy (Python twin; the native C++
store is differential-tested against this one in test_prefix_store_native)."""

import random

import pytest

from quantizedattention_tpu.serve.prefix_store import PyPrefixStore


PS = 4  # tiny pages keep the token math readable


def toks(*pages):
    out = []
    for p in pages:
        out.extend(p)
    return out


def test_lookup_empty_store_misses():
    st = PyPrefixStore(PS)
    assert st.lookup(list(range(10))) == []
    assert st.n_nodes == 0


def test_register_then_lookup_chain():
    st = PyPrefixStore(PS)
    prompt = list(range(11))  # 2 full pages + 3-token tail
    owned = st.register(prompt, [7, 8, 9])
    assert owned == [7, 8]          # only FULL pages enter the store
    assert st.n_nodes == 2
    assert st.lookup(prompt) == [7, 8]
    assert st.lookup(prompt[:8]) == [7, 8]
    assert st.lookup(prompt[:7]) == [7]     # second page only half-matches
    assert st.lookup([99] + prompt[1:]) == []  # first page differs
    # extension shares the prefix chain
    assert st.lookup(prompt[:8] + [42, 43, 44, 45]) == [7, 8]


def test_refcounts_and_release():
    st = PyPrefixStore(PS)
    prompt = list(range(8))
    st.register(prompt, [3, 4])
    assert st.refcount(3) == 1 and st.refcount(4) == 1  # owner's refs
    hit = st.lookup(prompt)
    st.acquire(hit)
    assert st.refcount(3) == 2
    st.release(hit)
    st.release([3, 4])
    assert st.refcount(3) == 0 and st.refcount(4) == 0
    # release of unknown / already-zero pages is a no-op
    st.release([3, 999])
    assert st.refcount(3) == 0


def test_evict_leaf_first_lru():
    st = PyPrefixStore(PS)
    a = list(range(12))                      # 3 full pages: chain 1->2->3
    st.register(a, [1, 2, 3])
    st.release([1, 2, 3])
    # parent pages have children: only the leaf (3) is evictable
    assert st.n_evictable == 1
    assert st.evict(1) == [3]
    # now 2 is the leaf
    assert st.evict(2) == [2, 1]
    assert st.n_nodes == 0


def test_evict_lru_order_among_leaves():
    st = PyPrefixStore(PS)
    st.register(list(range(4)), [1])
    st.register(list(range(100, 104)), [2])
    st.release([1])
    st.release([2])
    st.lookup(list(range(4)))  # bump page 1's stamp
    assert st.evict(1) == [2]  # 2 is now least recently used
    assert st.evict(1) == [1]


def test_evict_skips_referenced():
    st = PyPrefixStore(PS)
    st.register(list(range(4)), [5])
    assert st.evict(5) == []   # owner still holds a ref
    st.release([5])
    assert st.evict(5) == [5]


def test_duplicate_registration_stays_private():
    st = PyPrefixStore(PS)
    prompt = list(range(8))
    assert st.register(prompt, [1, 2]) == [1, 2]
    # a racing admission prefilled the same prompt into its own pages
    assert st.register(prompt, [8, 9]) == []   # both stay private
    assert st.refcount(8) == -1                # not store pages
    assert st.lookup(prompt) == [1, 2]         # canonical chain unchanged
    # a LONGER duplicate chains its new tail under the canonical parent
    longer = prompt + list(range(50, 54))
    assert st.register(longer, [8, 9, 10]) == [10]
    assert st.lookup(longer) == [1, 2, 10]


def test_register_after_admission_hit_keeps_single_ref():
    st = PyPrefixStore(PS)
    prompt = list(range(8))
    st.register(prompt, [1, 2])
    ext = prompt + list(range(70, 74))
    hit = st.lookup(ext)
    st.acquire(hit)                     # admission
    owned = st.register(ext, hit + [6])
    assert owned == [1, 2, 6]
    # the admission ref is the one reference this slot holds on 1,2
    assert st.refcount(1) == 2 and st.refcount(6) == 1
    st.release(owned)
    assert st.refcount(1) == 1 and st.refcount(6) == 0


def test_lookup_max_pages_cap():
    st = PyPrefixStore(PS)
    prompt = list(range(16))
    st.register(prompt, [1, 2, 3, 4])
    assert st.lookup(prompt, max_pages=2) == [1, 2]


def test_stress_random_ops_conserve_pages():
    """Random register/lookup+acquire/release/evict cycles never lose or
    duplicate a page: store pages + free-pool pages == all pages."""
    rng = random.Random(0)
    st = PyPrefixStore(PS)
    pool = list(range(1, 200))
    live = {}  # slot -> (owned_store_pages, private_pages)
    prompts = [[rng.randrange(5) for _ in range(rng.randrange(4, 24))] for _ in range(12)]
    for step in range(400):
        op = rng.random()
        if op < 0.5 and len(live) < 8:
            prompt = rng.choice(prompts)
            n_full = len(prompt) // PS
            hit = st.lookup(prompt, max_pages=max(0, n_full - 1))
            need = n_full + 1 - len(hit)
            if len(pool) < need:
                got = st.evict(need - len(pool))
                pool.extend(got)
            if len(pool) < need:
                continue
            st.acquire(hit)
            fresh = [pool.pop() for _ in range(need)]
            row = hit + fresh
            owned = st.register(prompt, row)
            private = [p for p in row if p not in owned]
            live[step] = (owned, private)
        elif live:
            slot = rng.choice(list(live))
            owned, private = live.pop(slot)
            st.release(owned)
            pool.extend(private)
        # invariant: every page is in exactly one place
        store_pages = set(st._by_page)
        pool_pages = set(pool)
        live_owned = set()
        live_private = set()
        for owned, private in live.values():
            live_owned |= set(owned)
            live_private |= set(private)
        assert not (store_pages & pool_pages)
        assert not (live_private & store_pages)
        assert live_owned <= store_pages
        assert store_pages | pool_pages | live_private == set(range(1, 200))
    # drain: release everything, evict all -> every page back in the pool
    for owned, private in live.values():
        st.release(owned)
        pool.extend(private)
    pool.extend(st.evict(10 ** 6))
    assert sorted(pool) == list(range(1, 200))
    assert st.n_nodes == 0
