"""GQA-native kernel tests: unrepeated-KV prefill/training paths.

The decode kernel was GQA-native from round 2 (parallel/kv_cache.py); round 4
extends the prefill/training kernels to take unrepeated K/V directly —
one K/V VMEM residency serves the whole q group, cutting K/V HBM reads and
(for int8) quantize work rep-fold vs the jnp.repeat boundary the round-3
verdict flagged (next #2). No reference counterpart (its kernels are
single-head-count, attention_bf16.py:107); parity oracle = the repeated-KV
path and jax.grad of the fp32 reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedattention_tpu.ops.api import flash_attention_bf16, sage_attention_int8
from quantizedattention_tpu.ops.flash_bwd import flash_attention_bwd
from quantizedattention_tpu.ops.flash_fwd import flash_attention_fwd
from quantizedattention_tpu.reference import reference_attention


def _qkv(key, B, H, HKV, T, D, tkv=None, dtype=jnp.float32):
    kq, kk, kv, kd = jax.random.split(key, 4)
    tkv = T if tkv is None else tkv
    q = jax.random.normal(kq, (B, H, T, D), dtype)
    k = jax.random.normal(kk, (B, HKV, tkv, D), dtype)
    v = jax.random.normal(kv, (B, HKV, tkv, D), dtype)
    do = jax.random.normal(kd, (B, H, T, D), jnp.float32)
    return q, k, v, do


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("precision", ["bf16", "fp32"])
def test_gqa_fwd_matches_repeated(causal, precision):
    q, k, v, _ = _qkv(jax.random.key(0), 2, 8, 2, 384, 64)
    rep = 4
    o_g, lse_g = flash_attention_fwd(q, k, v, causal=causal, precision=precision)
    o_r, lse_r = flash_attention_fwd(
        q, jnp.repeat(k, rep, 1), jnp.repeat(v, rep, 1),
        causal=causal, precision=precision,
    )
    np.testing.assert_allclose(np.asarray(o_g), np.asarray(o_r), atol=1e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(lse_g), np.asarray(lse_r), atol=1e-6, rtol=0)


def test_gqa_fwd_cross_lengths():
    q, k, v, _ = _qkv(jax.random.key(1), 1, 4, 2, 77, 64, tkv=201)
    o_g, _ = flash_attention_fwd(q, k, v, causal=False)
    o_r, _ = flash_attention_fwd(
        q, jnp.repeat(k, 2, 1), jnp.repeat(v, 2, 1), causal=False
    )
    np.testing.assert_allclose(np.asarray(o_g), np.asarray(o_r), atol=1e-6, rtol=0)


def test_gqa_rejects_bad_ratio():
    q, k, v, _ = _qkv(jax.random.key(2), 1, 6, 4, 128, 64)
    with pytest.raises(ValueError, match="multiple"):
        flash_attention_fwd(q, k, v)


@pytest.mark.parametrize("causal", [False, True])
def test_gqa_bwd_matches_grad_oracle(causal):
    q, k, v, do = _qkv(jax.random.key(3), 2, 8, 2, 384, 64)
    rep = 4
    o, lse = flash_attention_fwd(q, k, v, causal=causal, precision="fp32")
    dq, dk, dv = flash_attention_bwd(q, k, v, o, lse, do, causal=causal)

    def loss(q_, k_, v_):
        kr, vr = jnp.repeat(k_, rep, 1), jnp.repeat(v_, rep, 1)
        return jnp.vdot(reference_attention(q_, kr, vr, causal=causal), do)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert dk.shape == k.shape and dv.shape == v.shape
    np.testing.assert_allclose(np.asarray(dq), np.asarray(gq), atol=2e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(gk), atol=2e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(gv), atol=2e-3, rtol=0)


def test_gqa_bf16_custom_vjp_grads():
    q, k, v, do = _qkv(jax.random.key(4), 2, 8, 2, 256, 64, dtype=jnp.bfloat16)
    rep = 4

    def loss(q_, k_, v_):
        return jnp.vdot(flash_attention_bf16(q_, k_, v_, causal=True), do)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert gk.shape == k.shape and gv.shape == v.shape

    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))

    def oracle(q_, k_, v_):
        kr, vr = jnp.repeat(k_, rep, 1), jnp.repeat(v_, rep, 1)
        return jnp.vdot(reference_attention(q_, kr, vr, causal=True), do)

    oq, ok, ov = jax.grad(oracle, argnums=(0, 1, 2))(qf, kf, vf)
    for got, want in ((gq, oq), (gk, ok), (gv, ov)):
        scale = float(jnp.max(jnp.abs(want)))
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
        assert err / scale < 2e-2, (err, scale)


def test_gqa_int8_fused_matches_materialized():
    """The fused inference kernel (in-kernel quantization, serving default)
    under GQA: must match the materialized int8 forward (same quantization
    grid per kv head) and its own repeated-KV run."""
    from quantizedattention_tpu.ops.int8_fwd import (
        int8_attention_fwd,
        int8_attention_fwd_fused,
    )

    q, k, v, _ = _qkv(jax.random.key(6), 2, 8, 2, 256, 64)
    o_f, lse_f = int8_attention_fwd_fused(q, k, v, causal=True)
    o_m, lse_m, _ = int8_attention_fwd(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_m), atol=1e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(lse_f), np.asarray(lse_m), atol=1e-5, rtol=0)
    o_r, lse_r = int8_attention_fwd_fused(
        q, jnp.repeat(k, 4, 1), jnp.repeat(v, 4, 1), causal=True
    )
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_r), atol=1e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(lse_f), np.asarray(lse_r), atol=1e-5, rtol=0)


def test_gqa_int8_cross_lengths():
    q, k, v, _ = _qkv(jax.random.key(7), 1, 4, 2, 256, 64, tkv=384)
    from quantizedattention_tpu.ops.int8_fwd import int8_attention_fwd

    o_g, _, _ = int8_attention_fwd(q, k, v, causal=False)
    o_r, _, _ = int8_attention_fwd(
        q, jnp.repeat(k, 2, 1), jnp.repeat(v, 2, 1), causal=False
    )
    np.testing.assert_allclose(np.asarray(o_g), np.asarray(o_r), atol=1e-5, rtol=0)


def test_mqa_single_kv_head():
    """MQA edge (h_kv=1, rep=8): fwd + custom_vjp grads vs the repeated
    path — the largest group the models here can produce."""
    q, k, v, do = _qkv(jax.random.key(8), 1, 8, 1, 256, 64, dtype=jnp.bfloat16)

    def loss_g(q_, k_, v_):
        return jnp.vdot(flash_attention_bf16(q_, k_, v_, causal=True), do)

    def loss_r(q_, k_, v_):
        kr, vr = jnp.repeat(k_, 8, 1), jnp.repeat(v_, 8, 1)
        return jnp.vdot(flash_attention_bf16(q_, kr, vr, causal=True), do)

    (lg, (gq, gk, gv)) = jax.value_and_grad(loss_g, argnums=(0, 1, 2))(q, k, v)
    (lr, (rq, rk, rv)) = jax.value_and_grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    assert gk.shape == k.shape
    np.testing.assert_allclose(float(lg), float(lr), rtol=1e-5)
    # grads are bf16: the rep-grouped tiles round differently from the
    # repeated-head tiles at the last bit — compare at bf16-ulp scale
    # (same criterion as test_gqa_bf16_custom_vjp_grads)
    for got, want in ((gq, rq), (gk, rk), (gv, rv)):
        g32, w32 = np.asarray(got, np.float32), np.asarray(want, np.float32)
        scale = float(np.max(np.abs(w32)))
        assert float(np.max(np.abs(g32 - w32))) / scale < 2e-2


def test_clamp_rep_bounds_group_rows():
    from quantizedattention_tpu.tune.config import BlockConfig

    cfg = BlockConfig(block_q=1024, block_kv=1024, block_q_bwd=1024,
                      block_kv_bwd=1024)
    assert cfg.clamp_rep(1) is cfg
    # rep=4: the unrolled group's live tiles must fit the scoped-vmem
    # stack — the v5e compile sweep (experiments/gqa_compile_check.py)
    # showed every rep*block_q = 4096-row config OOMs (16.1-19.3 MB)
    # while every 2048-row config fits, so the row cap is 2048.
    c4 = cfg.clamp_rep(4)
    assert c4.block_q == 512
    assert c4.block_kv == 1024  # kv DMA axis untouched
    assert 4 * c4.block_q * c4.kv_compute <= 2 * 1024 * 1024
    assert 4 * c4.block_q_bwd * c4.block_kv_bwd <= 1024 * 1024
    assert cfg.clamp_rep(8).block_q == 256
    c16 = cfg.clamp_rep(16)
    assert c16.block_q == 128
    assert c16.block_kv == 1024  # kv axis untouched
    assert 16 * c16.block_q * c16.kv_compute <= 2 * 1024 * 1024
    assert 16 * c16.block_q_bwd * c16.block_kv_bwd <= 1024 * 1024
    assert cfg.clamp_rep(64).block_q == 128  # floor
    assert c16.clamp_rep(16) == c16  # idempotent
    assert c4.clamp_rep(4) == c4  # idempotent


def test_mqa_large_rep_long_seq_clamps_and_matches():
    """rep=16 at T=1024: the default block_q=1024 would put rep*block_q*128
    f32 softmax-stat scratch at 16.8 MB — over v5e's 16 MB scoped VMEM
    (Mosaic enforces this only on real lowering, CLAUDE.md). clamp_rep
    shrinks block_q to 128 (the 2048-row cap); this pins the clamped
    tiling's correctness
    (fwd + custom_vjp grads, and int8 where the quantization grain must
    track the clamp) against the repeated-KV path."""
    q, k, v, do = _qkv(jax.random.key(9), 1, 16, 1, 1024, 64, dtype=jnp.bfloat16)

    def loss_g(q_, k_, v_):
        return jnp.vdot(flash_attention_bf16(q_, k_, v_, causal=True), do)

    def loss_r(q_, k_, v_):
        kr, vr = jnp.repeat(k_, 16, 1), jnp.repeat(v_, 16, 1)
        return jnp.vdot(flash_attention_bf16(q_, kr, vr, causal=True), do)

    (lg, (gq, gk, gv)) = jax.value_and_grad(loss_g, argnums=(0, 1, 2))(q, k, v)
    (lr, (rq, rk, rv)) = jax.value_and_grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    assert gk.shape == k.shape
    np.testing.assert_allclose(float(lg), float(lr), rtol=1e-5)
    for got, want in ((gq, rq), (gk, rk), (gv, rv)):
        g32, w32 = np.asarray(got, np.float32), np.asarray(want, np.float32)
        scale = float(np.max(np.abs(w32)))
        assert float(np.max(np.abs(g32 - w32))) / scale < 2e-2

    # int8: quantize_qkv's q grain, the fwd kernel, and the residual-derived
    # backward must all land on the same clamped block_q. The oracle run
    # pins the SAME grain explicitly (clamp_rep is a no-op on it at rep=1),
    # since a different q-quantization grain changes the scales themselves.
    from quantizedattention_tpu.tune.config import BlockConfig

    cfg = BlockConfig(block_q=256, block_kv=1024, block_q_bwd=256,
                      block_kv_bwd=1024)
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    o_g = sage_attention_int8(qf, kf, vf, causal=True)  # clamps to cfg's grain
    o_r = sage_attention_int8(
        qf, jnp.repeat(kf, 16, 1), jnp.repeat(vf, 16, 1), causal=True,
        config=cfg,
    )
    np.testing.assert_allclose(np.asarray(o_g), np.asarray(o_r), atol=1e-5, rtol=0)


def test_gqa_int8_matches_repeated():
    q, k, v, do = _qkv(jax.random.key(5), 2, 8, 2, 256, 64)
    rep = 4

    def loss_g(q_, k_, v_):
        return jnp.vdot(sage_attention_int8(q_, k_, v_, causal=True), do)

    def loss_r(q_, k_, v_):
        kr, vr = jnp.repeat(k_, rep, 1), jnp.repeat(v_, rep, 1)
        return jnp.vdot(sage_attention_int8(q_, kr, vr, causal=True), do)

    (lg, (gq, gk, gv)) = jax.value_and_grad(loss_g, argnums=(0, 1, 2))(q, k, v)
    # oracle: repeat OUTSIDE the kernel; jax.grad of jnp.repeat already
    # group-sums the cotangent back to kv-head count
    (lr, (rq, rk, rv)) = jax.value_and_grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    assert gk.shape == k.shape and rk.shape == k.shape
    # The GQA path quantizes the UNREPEATED K/V (one block scale per kv head)
    # while the repeated path quantizes per q head — identical values, so the
    # block absmax/scales coincide and outputs agree to f32 roundoff.
    np.testing.assert_allclose(float(lg), float(lr), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=1e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=1e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=1e-4, rtol=0)
