"""Automatic prefix caching (paged engine): token-exactness vs the
non-caching engine, page accounting, shared-page lifetime, and eviction.

The sharing mechanism is host-side policy only (serve/prefix_store.py):
the device-side tail prefill is the ordinary chunked-prefill step reading
the prefix through the slot's page table, so a cached prefix is byte-exact
with a recomputed one and greedy tokens must match exactly."""

import jax
import pytest

from quantizedattention_tpu.models import TransformerConfig, init_transformer
from quantizedattention_tpu.serve import ServingEngine


def small_cfg(**kw):
    defaults = dict(
        vocab_size=64, d_model=64, n_heads=2, n_kv_heads=2, head_dim=64,
        n_layers=2, max_seq=512, attention="bf16",
    )
    defaults.update(kw)
    return TransformerConfig(**defaults)


@pytest.fixture(scope="module")
def lm():
    cfg = small_cfg()
    return init_transformer(jax.random.key(0), cfg), cfg


def _engine(params, cfg, prefix_cache, **kw):
    kw.setdefault("n_slots", 2)
    kw.setdefault("scheduler", "python")
    return ServingEngine(
        params, cfg, cache="paged", page_size=128, prefill_chunk=128,
        prefix_cache=prefix_cache, **kw,
    )


PROMPT_A = [int(x % 61) + 1 for x in range(300)]  # 2 full pages + 44 tail


def test_prefix_cache_requires_paged_and_chunked(lm):
    params, cfg = lm
    with pytest.raises(ValueError, match="paged"):
        ServingEngine(params, cfg, cache="slotted", prefill_chunk=128,
                      prefix_cache=True)
    with pytest.raises(ValueError, match="prefill_chunk"):
        ServingEngine(params, cfg, cache="paged", prefix_cache=True)


def test_prefix_hit_matches_cold_engine(lm):
    """Request B extends A's 256-token prefix: with prefix caching B
    prefills only its tail, and its greedy tokens are exactly the cold
    engine's."""
    params, cfg = lm
    prompt_b = PROMPT_A[:256] + [int(x % 53) + 2 for x in range(60)]

    cold = _engine(params, cfg, prefix_cache=False)
    ra = cold.submit(PROMPT_A, 8)
    res_a_cold = cold.run()
    rb = cold.submit(prompt_b, 8)
    res_b_cold = cold.run()

    warm = _engine(params, cfg, prefix_cache=True)
    wa = warm.submit(PROMPT_A, 8)
    res_a_warm = warm.run()
    assert warm.stats()["prefix_nodes"] == 2  # A's two full pages registered
    wb = warm.submit(prompt_b, 8)
    res_b_warm = warm.run()

    assert res_a_warm[wa].tokens == res_a_cold[ra].tokens
    assert res_b_warm[wb].tokens == res_b_cold[rb].tokens
    s = warm.stats()
    assert s["prefix_hit_pages"] >= 2  # B reused both of A's full pages
    # B's own full pages (including the shared prefix chain) are cached too
    assert s["prefix_nodes"] >= 2


def test_identical_prompt_reuses_and_matches(lm):
    """An exact repeat still computes >= 1 token (the reuse boundary is
    capped below the prompt end so last-token logits exist)."""
    params, cfg = lm
    cold = _engine(params, cfg, prefix_cache=False)
    r0 = cold.submit(PROMPT_A, 8)
    want = cold.run()[r0].tokens

    warm = _engine(params, cfg, prefix_cache=True)
    w0 = warm.submit(PROMPT_A, 8)
    first = warm.run()[w0].tokens
    w1 = warm.submit(PROMPT_A, 8)
    again = warm.run()[w1].tokens
    assert first == want
    assert again == want
    assert warm.stats()["prefix_hit_pages"] >= 2


def test_concurrent_sharers_and_early_finisher(lm):
    """Two live requests share A's cached prefix; one finishes first and
    releases its refs — the survivor's pages must stay intact (tokens equal
    the cold engine's)."""
    params, cfg = lm
    b1 = PROMPT_A[:256] + [3, 5, 7, 9]
    b2 = PROMPT_A[:256] + [11, 13]

    cold = _engine(params, cfg, prefix_cache=False)
    ca = cold.submit(PROMPT_A, 4)
    cold.run()
    c1 = cold.submit(b1, 4)
    c2 = cold.submit(b2, 24)  # finishes long after b1
    res_cold = cold.run()

    warm = _engine(params, cfg, prefix_cache=True)
    wa = warm.submit(PROMPT_A, 4)
    warm.run()
    w1 = warm.submit(b1, 4)
    w2 = warm.submit(b2, 24)
    res_warm = warm.run()

    assert res_warm[w1].tokens == res_cold[c1].tokens
    assert res_warm[w2].tokens == res_cold[c2].tokens
    # both sharers dropped their refs at completion: the chain is evictable
    store = warm._prefix_stores[0]
    assert store.refcount(store.lookup(PROMPT_A[:256])[0]) == 0


def test_eviction_under_pool_pressure(lm):
    """A tiny pool forces the store to recycle cached refcount-0 pages for
    a new unrelated prompt; admission succeeds and tokens are exact."""
    params, cfg = lm
    prompt_c = [int(x % 47) + 4 for x in range(290)]  # no shared prefix

    # pool of 4 usable pages: A needs 3 (300 prompt + 8 budget), caches 2
    cold = ServingEngine(params, cfg, cache="paged", page_size=128,
                         prefill_chunk=128, prefix_cache=False,
                         n_slots=1, scheduler="python", n_pages=5)
    r0 = cold.submit(prompt_c, 8)
    want = cold.run()[r0].tokens

    warm = ServingEngine(params, cfg, cache="paged", page_size=128,
                         prefill_chunk=128, prefix_cache=True,
                         n_slots=1, scheduler="python", n_pages=5)
    wa = warm.submit(PROMPT_A, 8)
    warm.run()
    assert warm.stats()["prefix_nodes"] == 2
    assert warm.stats()["pages_free"] == 2  # 4 usable - 2 cached
    wc = warm.submit(prompt_c, 8)  # needs 3 pages -> must evict one
    got = warm.run()[wc].tokens
    assert got == want
    # eviction took the chain leaf; C's own full pages registered after
    assert warm.stats()["prefix_nodes"] >= 2


def test_prefix_cache_with_native_components(lm):
    """scheduler='native' builds the C++ scheduler/pager (and the native
    prefix store once available; the factory falls back to the Python twin)
    — the end-to-end behavior must be identical either way."""
    params, cfg = lm
    prompt_b = PROMPT_A[:256] + [9, 8, 7, 6, 5]

    py = _engine(params, cfg, prefix_cache=True, scheduler="python")
    p0 = py.submit(PROMPT_A, 6)
    py.run()
    p1 = py.submit(prompt_b, 6)
    res_py = py.run()

    nat = _engine(params, cfg, prefix_cache=True, scheduler="native")
    n0 = nat.submit(PROMPT_A, 6)
    nat.run()
    n1 = nat.submit(prompt_b, 6)
    res_nat = nat.run()

    assert res_py[p1].tokens == res_nat[n1].tokens
    assert nat.stats()["prefix_hit_pages"] >= 2
