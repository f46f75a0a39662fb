"""Randomized shape sweep: every kernel family over irregular shapes.

The reference only ever tests (8, 35, 1024, 64) (SURVEY.md §4); its int8
backward is broken for q_len != kv_len precisely because no test varied
them (§2.3 Q5). This sweep draws awkward (batch, heads, q_len, kv_len,
head_dim) combinations — primes, off-block sizes, GQA-incompatible-looking
head counts, d=128 — and holds fwd/bwd/jvp to the fp32 oracle on each.
"""

import random

import jax
import jax.numpy as jnp
import pytest

from quantizedattention_tpu import (
    attention_jvp,
    flash_attention_bf16,
    sage_attention_int8,
)
from quantizedattention_tpu.reference import (
    reference_attention,
    reference_attention_vjp,
)
from quantizedattention_tpu.utils.testing import mismatch_report

_SHAPES = [
    # (batch, heads, q_len, kv_len, head_dim, causal)
    (1, 1, 17, 93, 64, False),
    (2, 3, 129, 257, 64, True),
    (1, 2, 100, 100, 128, True),
    (3, 1, 64, 511, 128, False),
    (1, 5, 251, 67, 64, True),   # q longer than kv under causal
]


def _qkv(seed, b, h, tq, tkv, d):
    ks = jax.random.split(jax.random.key(seed), 4)
    q = jax.random.normal(ks[0], (b, h, tq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, tkv, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, tkv, d), jnp.float32)
    do = jax.random.normal(ks[3], (b, h, tq, d), jnp.float32)
    return q, k, v, do


@pytest.mark.parametrize("b,h,tq,tkv,d,causal", _SHAPES)
def test_bf16_fwd_bwd_shape_sweep(b, h, tq, tkv, d, causal):
    q, k, v, do = _qkv(hash((b, h, tq)) % 1000, b, h, tq, tkv, d)
    q16, k16, v16 = (x.astype(jnp.bfloat16) for x in (q, k, v))

    o = flash_attention_bf16(q16, k16, v16, causal=causal)
    want = reference_attention(q, k, v, causal=causal)
    rep = mismatch_report("fwd", o, want, atol=1e-2)
    assert rep.mismatch_rate <= 1e-3, rep

    def loss(q_, k_, v_):
        return jnp.vdot(flash_attention_bf16(q_, k_, v_, causal=causal), do)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q16, k16, v16)
    wants = reference_attention_vjp(q, k, v, do, causal=causal)
    for nm, g, w in zip(("dq", "dk", "dv"), grads, wants):
        rep = mismatch_report(nm, g.astype(jnp.float32), w, atol=1e-2)
        assert rep.mismatch_rate <= 2e-3, rep


@pytest.mark.parametrize("b,h,tq,tkv,d,causal", _SHAPES)
def test_int8_fwd_shape_sweep(b, h, tq, tkv, d, causal):
    q, k, v, _ = _qkv(hash((tkv, d)) % 1000, b, h, tq, tkv, d)
    o = sage_attention_int8(q, k, v, causal=causal)
    want = reference_attention(q, k, v, causal=causal)
    rep = mismatch_report("int8", o, want, atol=5e-2)
    assert rep.mismatch_rate <= 5e-3, rep


@pytest.mark.parametrize("b,h,tq,tkv,d,causal", _SHAPES[:3])
def test_jvp_shape_sweep(b, h, tq, tkv, d, causal):
    if tq != tkv and causal:
        pytest.skip("jvp reference path: keep to shared-length causal")
    q, k, v, _ = _qkv(hash((b, d)) % 1000, b, h, tq, tkv, d)
    tq_ = jax.random.normal(jax.random.key(5), q.shape, jnp.float32)
    tk_ = jax.random.normal(jax.random.key(6), k.shape, jnp.float32)
    tv_ = jax.random.normal(jax.random.key(7), v.shape, jnp.float32)
    o, to = jax.jvp(
        lambda *p: attention_jvp(*p, causal=causal), (q, k, v), (tq_, tk_, tv_)
    )
    o_w, to_w = jax.jvp(
        lambda *p: reference_attention(*p, causal=causal), (q, k, v), (tq_, tk_, tv_)
    )
    assert mismatch_report("o", o, o_w, atol=1e-2).mismatch_rate <= 1e-3
    assert mismatch_report("to", to, to_w, atol=1e-2).mismatch_rate <= 1e-3
