"""Paged int8 KV cache: allocator, scatter/gather paths, decode parity.

Anchors:
  * the native C++ page allocator must match the Python twin step-for-step;
  * paged decode over DELIBERATELY shuffled, non-contiguous page
    assignments must equal the dense (slot) decode over the same K/V —
    proving the page-table gather in the BlockSpec index_map;
  * prompt-write + token-appends crossing page boundaries reproduce the
    fp32 oracle.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedattention_tpu.parallel import (
    append_kv,
    append_token_paged,
    assign_pages,
    decode_attention,
    init_kv_cache,
    init_paged_cache,
    paged_decode_attention,
    write_prompt_paged,
)
from quantizedattention_tpu.reference import reference_attention
from quantizedattention_tpu.serve import PyPager, make_pager
from quantizedattention_tpu.serve.scheduler import NativePager

PS = 128  # page size


def _native_pager_or_skip(n):
    try:
        return NativePager(n)
    except Exception as e:
        pytest.skip(f"native pager unavailable: {e}")


def test_pager_native_matches_python_differential():
    nat = _native_pager_or_skip(32)
    py = PyPager(32)
    rng = random.Random(1)
    held_n, held_p = [], []
    for _ in range(300):
        if rng.random() < 0.6 or not held_n:
            n = rng.randint(1, 6)
            a, b = nat.alloc(n), py.alloc(n)
            assert (a is None) == (b is None)
            if a is not None:
                assert a == b
                held_n.append(a)
                held_p.append(b)
        else:
            i = rng.randrange(len(held_n))
            nat.free(held_n.pop(i))
            py.free(held_p.pop(i))
        assert nat.num_free == py.num_free
    assert 0 not in [p for chunk in held_n for p in chunk]  # page 0 reserved


def test_pager_all_or_nothing():
    p = PyPager(4)  # 3 usable pages
    assert p.alloc(5) is None and p.num_free == 3
    got = p.alloc(3)
    assert sorted(got) == [1, 2, 3]
    assert p.alloc(1) is None
    p.free(got)
    assert p.num_free == 3


def test_paged_decode_matches_dense_with_shuffled_pages(rng):
    """Same K/V through dense slots vs shuffled non-contiguous pages."""
    n_seqs, h, d = 3, 4, 64
    lengths = [200, 377, 128]
    max_pages = 4  # up to 512 tokens
    kk, kv, kq = jax.random.split(rng, 3)
    ks = jax.random.normal(kk, (n_seqs, h, PS * max_pages, d), jnp.float32)
    vs = jax.random.normal(kv, (n_seqs, h, PS * max_pages, d), jnp.float32)
    q = jax.random.normal(kq, (n_seqs, h, d), jnp.float32)

    # dense slot cache
    dense = init_kv_cache(n_seqs, h, PS * max_pages, d)
    dense = append_kv(dense, ks, vs)
    dense = dense._replace(length=jnp.asarray(lengths, jnp.int32))
    want = decode_attention(q, dense)

    # paged: shuffled page ids (1..), non-contiguous per sequence
    pager = make_pager(1 + n_seqs * max_pages, prefer_native=False)
    all_pages = pager.alloc(n_seqs * max_pages)
    random.Random(7).shuffle(all_pages)
    paged = init_paged_cache(h, 1 + n_seqs * max_pages, n_seqs, max_pages, d, PS)
    for s in range(n_seqs):
        pages = jnp.asarray(all_pages[s * max_pages:(s + 1) * max_pages], jnp.int32)
        paged = assign_pages(paged, jnp.int32(s), pages)
        paged = write_prompt_paged(
            paged, jnp.int32(s), ks[s], vs[s], jnp.int32(lengths[s])
        )
    got = paged_decode_attention(q, paged)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)  # bf16-rate dots, different tilings


def test_paged_append_across_page_boundary(rng):
    """Prompt of 120 tokens + 20 appends crosses the 128-token page edge."""
    h, d = 2, 64
    t0, n_new = 120, 20
    kk, kv, kq = jax.random.split(rng, 3)
    k_all = jax.random.normal(kk, (1, h, t0 + n_new, d), jnp.float32)
    v_all = jax.random.normal(kv, (1, h, t0 + n_new, d), jnp.float32)
    q = jax.random.normal(kq, (1, h, d), jnp.float32)

    paged = init_paged_cache(h, 8, 1, 2, d, PS)
    paged = assign_pages(paged, jnp.int32(0), jnp.asarray([3, 5], jnp.int32))
    k_pad = jnp.pad(k_all[0, :, :t0], ((0, 0), (0, PS - t0), (0, 0)))
    v_pad = jnp.pad(v_all[0, :, :t0], ((0, 0), (0, PS - t0), (0, 0)))
    paged = write_prompt_paged(paged, jnp.int32(0), k_pad, v_pad, jnp.int32(t0))
    active = jnp.ones((1,), bool)
    for i in range(n_new):
        paged = append_token_paged(
            paged, k_all[:, :, t0 + i : t0 + i + 1], v_all[:, :, t0 + i : t0 + i + 1],
            active,
        )
    assert int(paged.lengths[0]) == t0 + n_new

    got = paged_decode_attention(q, paged)
    want = reference_attention(q[:, :, None, :], k_all, v_all, causal=False)[:, :, 0]
    assert float(jnp.max(jnp.abs(got - want))) < 5e-2  # int8 envelope


def test_paged_append_inactive_never_corrupts(rng):
    """A finished row's stale table must not let its (masked) append write
    into pages now owned by another sequence."""
    h, d = 2, 64
    kk, kv, kq = jax.random.split(rng, 3)
    paged = init_paged_cache(h, 8, 2, 2, d, PS)
    # seq1 owns pages [3,5]; seq0 is finished and its STALE table points at
    # the same page 3 (worst case after reallocation)
    paged = assign_pages(paged, jnp.int32(1), jnp.asarray([3, 5], jnp.int32))
    k1 = jax.random.normal(kk, (h, PS, d), jnp.float32)
    v1 = jax.random.normal(kv, (h, PS, d), jnp.float32)
    paged = paged._replace(
        page_table=paged.page_table.at[0].set(jnp.asarray([3, 0], jnp.int32))
    )
    paged = write_prompt_paged(paged, jnp.int32(1), k1, v1, jnp.int32(PS))
    before = paged.k_pages[:, 3].copy()

    active = jnp.asarray([False, True], bool)
    k_new = jnp.full((2, h, 1, d), 99.0, jnp.float32)
    paged = append_token_paged(paged, k_new, k_new, active)
    # seq0 (inactive, stale table -> page 3 offset 0) must have been dropped
    np.testing.assert_array_equal(
        np.asarray(paged.k_pages[:, 3]), np.asarray(before)
    )
    assert int(paged.lengths[0]) == 0 and int(paged.lengths[1]) == PS + 1


def test_paged_append_at_capacity_never_clips(rng):
    """An active row whose table is FULL must drop the write (not clip onto
    the last page) and must not advance its length."""
    h, d = 2, 64
    paged = init_paged_cache(h, 4, 1, 1, d, PS)  # 1 page max per seq
    paged = assign_pages(paged, jnp.int32(0), jnp.asarray([2], jnp.int32))
    k1 = jax.random.normal(rng, (h, PS, d), jnp.float32)
    paged = write_prompt_paged(paged, jnp.int32(0), k1, k1, jnp.int32(PS))
    before = paged.k_pages[:, 2].copy()

    tok = jnp.full((1, h, 1, d), 7.0, jnp.float32)
    paged = append_token_paged(paged, tok, tok, jnp.ones((1,), bool))
    np.testing.assert_array_equal(np.asarray(paged.k_pages[:, 2]), np.asarray(before))
    assert int(paged.lengths[0]) == PS  # did not advance past capacity
