"""Second-order (reverse-over-forward) backward for JVP attention.

The reference's JVP kernel is forward-only (attention_jvp.py:24 — consumed
by `torch.func.jvp`), but its stated purpose is rCM distillation
(attention_jvp.py:1-11), which *trains* by backpropagating a loss that
contains the tangent output tO. That requires the VJP of the map

    (q, k, v, tq, tk, tv)  ->  (O, tO)

i.e. second-order derivatives of attention contracted against the tangent
direction. No counterpart exists in the reference; this module derives the
tile math from scratch and streams it with the same two-kernel race-free
structure as ops/flash_bwd (dKV pass owns kv tiles, dQ pass owns q tiles).

Tile math (p: softmax probabilities, exp2-domain recompute; tS, mu natural):

    p    = exp2(q·qk_scale Kᵀ − lse)
    tS   = (tQ Kᵀ + Q tKᵀ)·sm_scale
    tP   = p ∘ (tS − mu)                       mu = rowsum(p ∘ tS)  [residual]
    tP̄   = tŌ Vᵀ
    p̄    = Ō Vᵀ + tŌ tVᵀ + tP̄ ∘ (tS − mu) − c·tS
    dS   = p ∘ (p̄ − D̂)                         softmax VJP, natural domain
    tS̄   = p ∘ (tP̄ − c)

with per-row scalars precomputed OUTSIDE the kernels (each is a rowsum over
the full row, so it must close before any tile math uses it):

    D  = rowsum(Ō ∘ O)            classic FA2 row term
    c  = rowsum(tŌ ∘ O)           = rowsum(tP̄ ∘ p) after the PV contraction
    D̂  = D + rowsum(tŌ ∘ tO) − c·mu

(The rowsum(p ∘ tŌ tVᵀ) and rowsum(p ∘ tP̄ ∘ (tS−mu)) terms that appear in
rowsum(p̄ ∘ p) telescope through B = p·tV and tP·V = tO − B, and B cancels —
leaving D̂ expressible from forward residuals alone. Derivation checked
against jax.grad-of-jax.jvp of the fp32 oracle in tests/test_jvp_grad.py.)

Gradients:

    dV  = pᵀ Ō + tPᵀ tŌ                 dtV = pᵀ tŌ
    dK  = (dSᵀ Q + tS̄ᵀ tQ)·sm_scale     dtK = tS̄ᵀ Q · sm_scale
    dQ  = (dS K + tS̄ tK)·sm_scale       dtQ = tS̄ K · sm_scale

Setting tŌ=0 collapses everything to the classic FA2 backward; setting Ō=0
gives the pure tangent-loss gradients (the rCM case).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantizedattention_tpu.ops.common import MASK_VALUE, pad_tokens, qk_scales, tile_mask
from quantizedattention_tpu.tune.config import BlockConfig, default_block_config
from quantizedattention_tpu.utils.runtime import cdiv, use_interpret_mode

_LANES = 128


def _tile_terms(q_ref, k_ref, v_ref, tq_ref, tk_ref, tv_ref, do_ref, dto_ref,
                lse_ref, mu_ref, c_ref, dhat_ref,
                *, sm_scale, qk_scale, precision, causal, kv_padded,
                q_start, k_start, block_q, block_kv, kv_len):
    """Recompute the shared [block_q, block_kv] tile quantities."""

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    tq, tk, tv = tq_ref[0], tk_ref[0], tv_ref[0]
    do, dto = do_ref[0], dto_ref[0]
    lse = lse_ref[0][:, :1]
    mu = mu_ref[0][:, :1]
    c = c_ref[0][:, :1]
    dhat = dhat_ref[0][:, :1]

    # on-load [*, d] scale folding (cheap; avoids [bq, bkv]-sized passes)
    s = dot(q * qk_scale, k, ((1,), (1,)))
    if causal or kv_padded:
        mask = tile_mask(q_start, k_start, block_q, block_kv, kv_len, causal)
        s = jnp.where(mask, s, MASK_VALUE)
    p = jnp.exp2(s - lse)

    ts = dot(tq * sm_scale, k, ((1,), (1,))) + dot(q, tk * sm_scale, ((1,), (1,)))
    tsmu = ts - mu
    tpb = dot(dto, v, ((1,), (1,)))                       # tP̄ = tŌ Vᵀ
    pbar = (
        dot(do, v, ((1,), (1,)))                          # Ō Vᵀ
        + dot(dto, tv, ((1,), (1,)))                      # tŌ tVᵀ
        + tpb * tsmu
        - c * ts
    )
    ds = p * (pbar - dhat)
    tsb = p * (tpb - c)
    tp = p * tsmu
    return p, tp, ds, tsb, dot


def _jvp_dkv_kernel(
    q_ref, k_ref, v_ref, tq_ref, tk_ref, tv_ref, do_ref, dto_ref,
    lse_ref, mu_ref, c_ref, dhat_ref,
    dk_ref, dv_ref, dtk_ref, dtv_ref,
    dk_scr, dv_scr, dtk_scr, dtv_scr,
    *, sm_scale, qk_scale, causal, kv_len, num_q_blocks, block_q, block_kv,
    precision,
):
    kj = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)
        dtk_scr[...] = jnp.zeros_like(dtk_scr)
        dtv_scr[...] = jnp.zeros_like(dtv_scr)

    q_start = qi * block_q
    k_start = kj * block_kv
    kv_padded = kv_len % block_kv != 0

    def _body():
        p, tp, ds, tsb, dot = _tile_terms(
            q_ref, k_ref, v_ref, tq_ref, tk_ref, tv_ref, do_ref, dto_ref,
            lse_ref, mu_ref, c_ref, dhat_ref,
            sm_scale=sm_scale, qk_scale=qk_scale, precision=precision,
            causal=causal, kv_padded=kv_padded, q_start=q_start,
            k_start=k_start, block_q=block_q, block_kv=block_kv, kv_len=kv_len,
        )
        q, tq = q_ref[0], tq_ref[0]
        do, dto = do_ref[0], dto_ref[0]
        dv_scr[...] += dot(p, do, ((0,), (0,))) + dot(tp, dto, ((0,), (0,)))
        dtv_scr[...] += dot(p, dto, ((0,), (0,)))
        dk_scr[...] += dot(ds, q, ((0,), (0,))) + dot(tsb, tq, ((0,), (0,)))
        dtk_scr[...] += dot(tsb, q, ((0,), (0,)))

    if causal:
        pl.when(q_start + block_q - 1 >= k_start)(_body)
    else:
        _body()

    @pl.when(qi == num_q_blocks - 1)
    def _epilogue():
        dk_ref[0] = (dk_scr[...] * sm_scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)
        dtk_ref[0] = (dtk_scr[...] * sm_scale).astype(dtk_ref.dtype)
        dtv_ref[0] = dtv_scr[...].astype(dtv_ref.dtype)


def _jvp_dq_kernel(
    q_ref, k_ref, v_ref, tq_ref, tk_ref, tv_ref, do_ref, dto_ref,
    lse_ref, mu_ref, c_ref, dhat_ref,
    dq_ref, dtq_ref,
    dq_scr, dtq_scr,
    *, sm_scale, qk_scale, causal, kv_len, num_kv_blocks, block_q, block_kv,
    precision,
):
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)
        dtq_scr[...] = jnp.zeros_like(dtq_scr)

    q_start = qi * block_q
    k_start = kj * block_kv
    kv_padded = kv_len % block_kv != 0

    def _body():
        p, tp, ds, tsb, dot = _tile_terms(
            q_ref, k_ref, v_ref, tq_ref, tk_ref, tv_ref, do_ref, dto_ref,
            lse_ref, mu_ref, c_ref, dhat_ref,
            sm_scale=sm_scale, qk_scale=qk_scale, precision=precision,
            causal=causal, kv_padded=kv_padded, q_start=q_start,
            k_start=k_start, block_q=block_q, block_kv=block_kv, kv_len=kv_len,
        )
        del p, tp
        k, tk = k_ref[0], tk_ref[0]
        dq_scr[...] += dot(ds, k, ((1,), (0,))) + dot(tsb, tk, ((1,), (0,)))
        dtq_scr[...] += dot(tsb, k, ((1,), (0,)))

    if causal:
        pl.when(q_start + block_q - 1 >= k_start)(_body)
    else:
        _body()

    @pl.when(kj == num_kv_blocks - 1)
    def _epilogue():
        dq_ref[0] = (dq_scr[...] * sm_scale).astype(dq_ref.dtype)
        dtq_ref[0] = (dtq_scr[...] * sm_scale).astype(dtq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "config", "fast", "interpret"),
)
def attention_jvp_bwd(
    q, k, v, tq, tk, tv, o, to, lse, mu, do, dto,
    causal: bool = False,
    sm_scale: float | None = None,
    config: BlockConfig | None = None,
    fast: bool = False,
    interpret: bool | None = None,
):
    """VJP of (q,k,v,tq,tk,tv) -> (O,tO). Returns (dq, dk, dv, dtq, dtk, dtv).

    lse/mu: [b,h,t] residuals from attention_jvp_fwd. do/dto: cotangents of
    (O, tO). fast=True allows bf16-rate MXU passes (DEFAULT precision).
    """
    if interpret is None:
        interpret = use_interpret_mode()
    batch, head, q_tokens, head_dim = q.shape
    kv_len = k.shape[2]
    if config is None:
        config = default_block_config("jvp", q_tokens, kv_len, head_dim)
    block_q, block_kv = config.block_q_bwd, config.block_kv_bwd
    sm_scale, qk_scale = qk_scales(head_dim, sm_scale)
    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST

    bh = batch * head
    f32 = jnp.float32

    def prep_q(x):
        return pad_tokens(x.astype(f32).reshape(bh, q_tokens, head_dim), block_q, 1)

    def prep_kv(x):
        return pad_tokens(x.astype(f32).reshape(bh, kv_len, head_dim), block_kv, 1)

    q3, tq3, do3, dto3, o3, to3 = map(prep_q, (q, tq, do, dto, o, to))
    k3, tk3, v3, tv3 = map(prep_kv, (k, tk, v, tv))

    # per-row scalars (module docstring): D, c, D̂ — all from forward
    # residuals; padded q rows carry zero cotangents so they contribute 0.
    mu3 = pad_tokens(mu.astype(f32).reshape(bh, q_tokens), block_q, 1)
    lse3 = pad_tokens(lse.astype(f32).reshape(bh, q_tokens), block_q, 1)
    d_row = jnp.sum(do3 * o3, axis=-1)
    c_row = jnp.sum(dto3 * o3, axis=-1)
    dhat_row = d_row + jnp.sum(dto3 * to3, axis=-1) - c_row * mu3

    def lanes(x):
        return jnp.broadcast_to(x[..., None], (*x.shape, _LANES))

    lse_b, mu_b, c_b, dhat_b = lanes(lse3), lanes(mu3), lanes(c_row), lanes(dhat_row)

    padded_q, padded_kv = q3.shape[1], k3.shape[1]
    num_q_blocks = cdiv(padded_q, block_q)
    num_kv_blocks = cdiv(padded_kv, block_kv)

    common = dict(
        sm_scale=sm_scale, qk_scale=qk_scale, causal=causal, kv_len=kv_len,
        block_q=block_q, block_kv=block_kv, precision=precision,
    )

    kv_shape = jax.ShapeDtypeStruct((bh, padded_kv, head_dim), f32)
    q_shape = jax.ShapeDtypeStruct((bh, padded_q, head_dim), f32)

    # dKV pass: grid (b·h, kv, q) — each program owns one kv tile
    q_spec = pl.BlockSpec((1, block_q, head_dim), lambda b, j, i: (b, i, 0))
    kv_spec = pl.BlockSpec((1, block_kv, head_dim), lambda b, j, i: (b, j, 0))
    lane_spec = pl.BlockSpec((1, block_q, _LANES), lambda b, j, i: (b, i, 0))
    dk, dv, dtk, dtv = pl.pallas_call(
        functools.partial(_jvp_dkv_kernel, num_q_blocks=num_q_blocks, **common),
        grid=(bh, num_kv_blocks, num_q_blocks),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, kv_spec, kv_spec,
                  q_spec, q_spec, lane_spec, lane_spec, lane_spec, lane_spec],
        out_specs=[kv_spec, kv_spec, kv_spec, kv_spec],
        out_shape=[kv_shape, kv_shape, kv_shape, kv_shape],
        scratch_shapes=[pltpu.VMEM((block_kv, head_dim), f32)] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q3, k3, v3, tq3, tk3, tv3, do3, dto3, lse_b, mu_b, c_b, dhat_b)

    # dQ pass: grid (b·h, q, kv) — each program owns one q tile
    q_spec_q = pl.BlockSpec((1, block_q, head_dim), lambda b, i, j: (b, i, 0))
    kv_spec_q = pl.BlockSpec((1, block_kv, head_dim), lambda b, i, j: (b, j, 0))
    lane_spec_q = pl.BlockSpec((1, block_q, _LANES), lambda b, i, j: (b, i, 0))
    dq, dtq = pl.pallas_call(
        functools.partial(_jvp_dq_kernel, num_kv_blocks=num_kv_blocks, **common),
        grid=(bh, num_q_blocks, num_kv_blocks),
        in_specs=[q_spec_q, kv_spec_q, kv_spec_q, q_spec_q, kv_spec_q, kv_spec_q,
                  q_spec_q, q_spec_q, lane_spec_q, lane_spec_q, lane_spec_q,
                  lane_spec_q],
        out_specs=[q_spec_q, q_spec_q],
        out_shape=[q_shape, q_shape],
        scratch_shapes=[pltpu.VMEM((block_q, head_dim), f32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q3, k3, v3, tq3, tk3, tv3, do3, dto3, lse_b, mu_b, c_b, dhat_b)

    def cut_q(x):
        return x[:, :q_tokens].reshape(batch, head, q_tokens, head_dim)

    def cut_kv(x):
        return x[:, :kv_len].reshape(batch, head, kv_len, head_dim)

    return cut_q(dq), cut_kv(dk), cut_kv(dv), cut_q(dtq), cut_kv(dtk), cut_kv(dtv)
