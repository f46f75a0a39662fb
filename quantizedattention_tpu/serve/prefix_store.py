"""Automatic prefix caching for the paged KV cache (host-side policy).

Beyond-reference serving capability (the reference has no serving layer,
SURVEY.md §1): requests whose token prefixes coincide reuse the quantized
KV pages a previous request already computed — the engine prefills only the
tail. The device-side mechanism is the existing chunked-prefill path
(`models/transformer.py:prefill_chunk` reads the cached prefix through the
slot's page table), so the feature is pure HOST policy: which page ids go
into the table row, and when pages may return to the allocator.

Design (the vLLM "automatic prefix caching" structure, re-done for this
engine's page tables):

  * A store NODE is one FULL page of prompt tokens, keyed by
    (parent_page_id, page_tokens): the chain of parents spells the whole
    token prefix, so key equality == exact prefix equality, with O(1)
    lookup per page and no O(L^2) key material.
  * Refcounts count sequences whose LIVE table row uses the page. Pages at
    refcount 0 stay cached (not returned to the allocator) until pool
    pressure evicts them — leaf-first (children key off the parent id, so
    a parent must outlive its children in the store), LRU among leaves.
  * Only IMMUTABLE pages enter the store: the first len(prompt)//page_size
    pages of a prefilled prompt. Decode appends at position >= len(prompt),
    so a registered page is never written again; sharing needs no
    copy-on-write.
  * Content is deterministic in (params, token prefix): K/V projections use
    absolute RoPE positions and per-token int8 quantization, so a store hit
    is byte-exact with recomputation (tests pin token-exactness).
  * Duplicate admissions (two identical prompts admitted before either
    registers) converge: register() walks the chain and, on finding an
    existing node with a DIFFERENT page id, keeps the caller's page private
    (freed normally when its slot drops) while chaining children under the
    canonical id — future lookups share maximally.

The native C++ core lives in native/prefix_store.cpp (C ABI via ctypes,
same pattern as the scheduler); PyPrefixStore is the identical-policy twin
and the differential-test oracle (serve/scheduler.py convention).
"""

from __future__ import annotations

import ctypes
from typing import Sequence


class _Node:
    __slots__ = ("page", "parent", "tokens", "ref", "children", "stamp")

    def __init__(self, page: int, parent: int, tokens: tuple):
        self.page = page
        self.parent = parent
        self.tokens = tokens
        self.ref = 0
        self.children = 0
        self.stamp = 0


class PyPrefixStore:
    """Pure-Python prefix store (policy oracle for native/prefix_store.cpp).

    All token inputs are sequences of ints; pages are allocator page ids.
    The store never talks to the pager — the engine moves pages between the
    two (evicted pages go back to the pager; registered pages leave it).
    """

    ROOT = -1

    def __init__(self, page_size: int):
        if page_size <= 0:
            raise ValueError(f"bad page_size {page_size}")
        self.page_size = page_size
        self._by_key: dict[tuple, _Node] = {}   # (parent, tokens) -> node
        self._by_page: dict[int, _Node] = {}    # page id -> node
        self._clock = 0
        # observability
        self.hits = 0          # pages served from the store by lookup()
        self.misses = 0        # full pages lookup() could not serve

    # -- internals ---------------------------------------------------------

    def _tick(self) -> int:
        self._clock += 1
        return self._clock

    def _full_pages(self, tokens: Sequence[int]):
        ps = self.page_size
        n = len(tokens) // ps
        for i in range(n):
            yield tuple(tokens[i * ps:(i + 1) * ps])

    # -- engine API --------------------------------------------------------

    def lookup(self, tokens: Sequence[int], max_pages: int | None = None) -> list[int]:
        """Longest chain of cached FULL pages matching `tokens`' prefix.

        Returns the page ids, in prefix order. Does NOT take references —
        call acquire() once the admission is certain (so a failed admission
        can't leak refs). Bumps LRU stamps of the returned chain.
        """
        out: list[int] = []
        parent = self.ROOT
        for tup in self._full_pages(tokens):
            if max_pages is not None and len(out) >= max_pages:
                break
            node = self._by_key.get((parent, tup))
            if node is None:
                self.misses += 1
                break
            node.stamp = self._tick()
            out.append(node.page)
            parent = node.page
        self.hits += len(out)
        return out

    def acquire(self, pages: Sequence[int]) -> None:
        """Take one reference per page (pages must be store nodes)."""
        for p in pages:
            self._by_page[p].ref += 1

    def release(self, pages: Sequence[int]) -> None:
        """Drop one reference per page; the page stays cached (refcount 0)
        until evicted. Non-store pages are ignored (the engine releases a
        slot's whole shared list; eviction may have removed some already)."""
        for p in pages:
            node = self._by_page.get(p)
            if node is not None and node.ref > 0:
                node.ref -= 1
                node.stamp = self._tick()

    def register(self, tokens: Sequence[int], pages: Sequence[int]) -> list[int]:
        """Offer the owner's full-prompt pages to the store after prefill.

        tokens: the whole prompt; pages: the slot's table row (prefix
        order; only the first len(tokens)//page_size entries are
        considered — the rest are mutable and never offered).

        Returns the pages NOW OWNED BY THE STORE out of `pages` (each with
        one reference held by the caller — already-acquired shared hits
        keep their admission ref; newly registered pages gain the owner's
        ref). Pages NOT in the returned list stayed private (duplicates of
        an existing chain) and remain the caller's to free.
        """
        owned: list[int] = []
        parent = self.ROOT
        for i, tup in enumerate(self._full_pages(tokens)):
            page = pages[i]
            node = self._by_key.get((parent, tup))
            if node is not None:
                if node.page == page:
                    # the caller's own admission hit — ref already held
                    owned.append(page)
                # else: duplicate content; caller's page stays private
                parent = node.page
                continue
            node = _Node(page, parent, tup)
            node.ref = 1  # the registering owner
            node.stamp = self._tick()
            self._by_key[(parent, tup)] = node
            self._by_page[page] = node
            if parent != self.ROOT:
                pnode = self._by_page.get(parent)
                if pnode is not None:
                    pnode.children += 1
            owned.append(page)
            parent = page
        return owned

    def evict(self, n: int) -> list[int]:
        """Remove up to `n` refcount-0 LEAF pages (LRU first) from the
        store and return them (the engine hands them back to the pager).
        Evicting a leaf may expose its parent; the loop re-scans until `n`
        pages are out or nothing is evictable."""
        out: list[int] = []
        while len(out) < n:
            best: _Node | None = None
            for node in self._by_page.values():
                if node.ref == 0 and node.children == 0:
                    if best is None or node.stamp < best.stamp:
                        best = node
            if best is None:
                break
            del self._by_key[(best.parent, best.tokens)]
            del self._by_page[best.page]
            if best.parent != self.ROOT:
                pnode = self._by_page.get(best.parent)
                if pnode is not None:
                    pnode.children -= 1
            out.append(best.page)
        return out

    # -- observability -----------------------------------------------------

    @property
    def n_nodes(self) -> int:
        return len(self._by_page)

    @property
    def n_evictable(self) -> int:
        return sum(1 for n in self._by_page.values() if n.ref == 0 and n.children == 0)

    def refcount(self, page: int) -> int:
        node = self._by_page.get(page)
        return -1 if node is None else node.ref


def make_prefix_store(page_size: int, prefer_native: bool = True):
    """Native prefix store when the C++ core builds, Python twin otherwise
    (same factory contract as make_pager / make_scheduler)."""
    if prefer_native:
        try:
            return NativePrefixStore(page_size)
        except Exception:
            pass
    return PyPrefixStore(page_size)


class NativePrefixStore:
    """ctypes handle to the C++ prefix store (native/prefix_store.cpp)."""

    def __init__(self, page_size: int):
        from quantizedattention_tpu.serve import _prefix_native

        self._lib = _prefix_native.load()
        self._h = self._lib.qa_pstore_create(page_size)
        if not self._h:
            raise ValueError(f"bad page_size {page_size}")
        self.page_size = page_size

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.qa_pstore_destroy(self._h)
            self._h = None

    def _tok_arr(self, tokens):
        return (ctypes.c_int32 * len(tokens))(*[int(t) for t in tokens])

    def lookup(self, tokens, max_pages: int | None = None) -> list[int]:
        cap = len(tokens) // self.page_size if max_pages is None else max_pages
        out = (ctypes.c_int32 * max(cap, 1))()
        n = self._lib.qa_pstore_lookup(
            self._h, self._tok_arr(tokens), len(tokens), cap, out)
        return list(out[:n])

    def acquire(self, pages) -> None:
        arr = (ctypes.c_int32 * len(pages))(*pages)
        if self._lib.qa_pstore_acquire(self._h, len(pages), arr) < 0:
            raise ValueError("acquire on non-store page")

    def release(self, pages) -> None:
        arr = (ctypes.c_int32 * len(pages))(*pages)
        self._lib.qa_pstore_release(self._h, len(pages), arr)

    def register(self, tokens, pages) -> list[int]:
        arr = (ctypes.c_int32 * len(pages))(*pages)
        out = (ctypes.c_int32 * max(len(pages), 1))()
        n = self._lib.qa_pstore_register(
            self._h, self._tok_arr(tokens), len(tokens), len(pages), arr, out)
        return list(out[:n])

    def evict(self, n: int) -> list[int]:
        out = (ctypes.c_int32 * max(n, 1))()
        got = self._lib.qa_pstore_evict(self._h, n, out)
        return list(out[:got])

    @property
    def n_nodes(self) -> int:
        return self._lib.qa_pstore_num_nodes(self._h)

    @property
    def n_evictable(self) -> int:
        return self._lib.qa_pstore_num_evictable(self._h)

    @property
    def hits(self) -> int:
        return self._lib.qa_pstore_hits(self._h)

    @property
    def misses(self) -> int:
        return self._lib.qa_pstore_misses(self._h)

    def refcount(self, page: int) -> int:
        return self._lib.qa_pstore_refcount(self._h, page)
