"""Quantized KV cache + decode attention tests."""

import jax
import jax.numpy as jnp

from quantizedattention_tpu.parallel import append_kv, decode_attention, init_kv_cache
from quantizedattention_tpu.reference import reference_attention
from quantizedattention_tpu.utils.testing import mismatch_report


def test_append_and_lengths(rng):
    cache = init_kv_cache(batch=2, n_kv_heads=2, max_len=512, head_dim=64)
    k1, k2 = jax.random.split(rng)
    k_new = jax.random.normal(k1, (2, 2, 100, 64))
    v_new = jax.random.normal(k2, (2, 2, 100, 64))
    cache = append_kv(cache, k_new, v_new)
    assert cache.length.tolist() == [100, 100]
    # appended region dequantizes back to within int8 step
    k_hat = cache.k_i8[:, :, :100].astype(jnp.float32) * cache.sk[:, :, :100]
    assert float(jnp.max(jnp.abs(k_hat - k_new))) < 0.05
    # un-touched tail stays zero
    assert int(jnp.abs(cache.k_i8[:, :, 100:]).max()) == 0


def test_decode_matches_oracle(rng):
    """Decode of one token == full attention's last-row output (GQA 8q/2kv)."""
    b, hq, hkv, t, d = 2, 8, 2, 300, 64
    kk, kv_, kq = jax.random.split(rng, 3)
    k = jax.random.normal(kk, (b, hkv, t, d))
    v = jax.random.normal(kv_, (b, hkv, t, d))
    q1 = jax.random.normal(kq, (b, hq, d))

    cache = init_kv_cache(b, hkv, max_len=512, head_dim=d)
    cache = append_kv(cache, k, v)
    o = decode_attention(q1, cache)
    assert o.shape == (b, hq, d)

    # oracle: repeat kv heads to GQA layout, single-query attention
    group = hq // hkv
    k_full = jnp.repeat(k, group, axis=1)
    v_full = jnp.repeat(v, group, axis=1)
    want = reference_attention(q1[:, :, None, :], k_full, v_full)[:, :, 0, :]
    rep = mismatch_report("decode", o, want, atol=5e-2)
    assert rep.mismatch_rate <= 2e-3, rep


def test_decode_respects_length(rng):
    """Tokens past `length` must not leak into the softmax."""
    b, hq, hkv, d = 1, 2, 2, 64
    kk, kv_, kq, kjunk = jax.random.split(rng, 4)
    k = jax.random.normal(kk, (b, hkv, 64, d))
    v = jax.random.normal(kv_, (b, hkv, 64, d))
    q1 = jax.random.normal(kq, (b, hq, d))

    cache_a = init_kv_cache(b, hkv, max_len=256, head_dim=d)
    cache_a = append_kv(cache_a, k, v)

    # cache_b has junk pre-written beyond length (simulates stale pages)
    cache_b = cache_a._replace(
        k_i8=cache_a.k_i8.at[:, :, 64:].set(7),
        sk=cache_a.sk.at[:, :, 64:].set(1.0),
        v_i8=cache_a.v_i8.at[:, :, 64:].set(-5),
        sv=cache_a.sv.at[:, :, 64:].set(1.0),
    )
    o_a = decode_attention(q1, cache_a)
    o_b = decode_attention(q1, cache_b)
    assert bool(jnp.allclose(o_a, o_b, atol=1e-6))


def test_incremental_decode_sequence(rng):
    """Append tokens one at a time; each decode sees exactly the prefix."""
    b, hq, hkv, d = 1, 4, 2, 64
    keys = jax.random.split(rng, 8)
    cache = init_kv_cache(b, hkv, max_len=128, head_dim=d)
    k_all = jax.random.normal(keys[0], (b, hkv, 16, d))
    v_all = jax.random.normal(keys[1], (b, hkv, 16, d))
    q1 = jax.random.normal(keys[2], (b, hq, d))

    cache = append_kv(cache, k_all[:, :, :10], v_all[:, :, :10])
    o10 = decode_attention(q1, cache)
    cache = append_kv(cache, k_all[:, :, 10:], v_all[:, :, 10:])
    o16 = decode_attention(q1, cache)

    group = hq // hkv
    for t, o in [(10, o10), (16, o16)]:
        k_full = jnp.repeat(k_all[:, :, :t], group, axis=1)
        v_full = jnp.repeat(v_all[:, :, :t], group, axis=1)
        want = reference_attention(q1[:, :, None, :], k_full, v_full)[:, :, 0, :]
        rep = mismatch_report(f"decode@{t}", o, want, atol=5e-2)
        assert rep.mismatch_rate <= 5e-3, rep
