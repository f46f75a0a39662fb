"""SageAttention3-style INT8 flash-attention forward (Pallas/Mosaic).

TPU-native re-design of the reference's `helion_atten_int8_hl_dot_fwd`
(attention_int8.py:97-262): per-block symmetric int8 quantization of Q/K/V,
QKᵀ and PV matmuls on the MXU in int8 with int32 accumulation (the TPU
counterpart of `hl.dot(int8, int8) -> int32` on CUDA tensor cores), online
softmax in f32, and per-q-row quantization of P with scale
sp = exp2(rowmax(S) − m)/127 (attention_int8.py:227-237).

Structural fixes vs the reference (SURVEY.md §2.3):
  * Q4 — the reference flattens [b,h,t,d] to [b·h·t, d] and lets softmax mix
    keys across batches and heads (attention_int8.py:129-136); here attention
    is per-(batch, head): grid (b·h, q_blocks, kv_blocks).
  * Q7 — the reference re-quantizes Q on every kv iteration
    (attention_int8.py:178-186); here Q/K/V are quantized once, per block,
    in a separate vectorized pass whose block granularity equals the kernel's
    (the reference ties them the same way by threading (Bq,Bkv) to backward).
  * The quantized blocks and scales are first-class outputs reused by the
    backward — the same residual contract as the reference's
    ctx.save_for_backward of (q_int8, k_int8ᵀ, v_int8, scales)
    (attention_int8.py:58-65).

Superset capability: `causal` masking (the reference int8 kernel has none).
Outputs are f32 (the reference emits fp16 — a CUDA register-pressure
convention; on TPU the accumulators are already f32 and callers may cast).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantizedattention_tpu.ops.common import MASK_VALUE, pad_tokens, qk_scales, tile_mask
from quantizedattention_tpu.quantize.int8 import quantize_int8_blocks
from quantizedattention_tpu.tune.config import BlockConfig, default_block_config
from quantizedattention_tpu.utils.runtime import cdiv, use_interpret_mode

_LANES = 128


def _int8_dot(a_i8, b_i8, dims):
    """int8 x int8 -> int32 on the MXU (the hl.dot counterpart)."""
    return jax.lax.dot_general(
        a_i8, b_i8, (dims, ((), ())), preferred_element_type=jnp.int32
    )


def _int8_fwd_kernel(
    q_ref, k_ref, v_ref, sq_ref, sk_ref, sv_ref,
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, qk_scale, causal, kv_len, num_kv_blocks, block_q, block_kv, block_sub,
):
    b = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q_start = qi * block_q
    k_start = kj * block_kv

    kv_padded = kv_len % block_kv != 0

    # Two-level kv tiling (see flash_fwd): DMA at block_kv, compute and
    # causal-skip at block_sub granularity. One scale per DMA block (the
    # quantization granularity) covers all of its subtiles.
    def _subtile(j):
        sub_start = k_start + j * block_sub

        def _sub_body():
            sq = sq_ref[b, qi]
            sk = sk_ref[b, kj]
            sv = sv_ref[b, kj]

            k_sub = k_ref[0, pl.ds(j * block_sub, block_sub), :]
            qk_i32 = _int8_dot(q_ref[0], k_sub, ((1,), (1,)))
            # dequantize straight to f32 — fp16 intermediates would overflow
            # (the reference notes the same at attention_int8.py:200-202)
            s = qk_i32.astype(jnp.float32) * (sq * sk * qk_scale)

            # masked logits underflow to 0 through exp2; junk rows self-heal
            # via alpha underflow (see flash_fwd), one where-pass suffices
            if causal or kv_padded:
                mask = tile_mask(q_start, sub_start, block_q, block_sub, kv_len, causal)
                s = jnp.where(mask, s, MASK_VALUE)

            m_prev = m_scr[...][:, :1]
            row_max = jnp.max(s, axis=-1, keepdims=True)
            next_m = jnp.maximum(m_prev, row_max)

            # Per-q-row P quantization fused into the exp2: with
            # sp = exp2(rowmax − m)/127 (attention_int8.py:227-237),
            # P/sp = exp2(s − rowmax + log2 127) — ONE exp2 pass produces the
            # int8 payload directly (+0.5-truncate = round-half-up; the max
            # is exactly 127.0, which stays 127 after +0.5 truncation), and l
            # sums the dequantized int8 P — consistent with the PV matmuls.
            log2_127 = 6.9886369
            p_i8 = (jnp.exp2(s - row_max + log2_127) + 0.5).astype(jnp.int8)
            sp = jnp.exp2(row_max - next_m) / 127.0

            alpha = jnp.exp2(m_prev - next_m)
            l_cur = jnp.sum(p_i8.astype(jnp.float32), axis=-1, keepdims=True) * sp
            l_next = l_scr[...][:, :1] * alpha + l_cur

            v_sub = v_ref[0, pl.ds(j * block_sub, block_sub), :]
            pv_i32 = _int8_dot(p_i8, v_sub, ((1,), (0,)))
            acc_scr[...] = acc_scr[...] * alpha + pv_i32.astype(jnp.float32) * (sp * sv)

            m_scr[...] = jnp.broadcast_to(next_m, m_scr.shape)
            l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

        if causal:
            pl.when(q_start + block_q - 1 >= sub_start)(_sub_body)
        else:
            _sub_body()

    for j in range(block_kv // block_sub):
        _subtile(j)

    @pl.when(kj == num_kv_blocks - 1)
    def _epilogue():
        l = l_scr[...][:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(m_scr[...][:, :1] + jnp.log2(l_safe), lse_ref.shape[1:])


def quantize_qkv(q, k, v, config: BlockConfig):
    """Per-block int8 quantization of Q/K/V at the kernel's block granularity.

    Returns ((q_i8, sq), (k_i8, sk), (v_i8, sv)) on [b·h, padded_t, d] /
    [b·h, n_blocks] layouts — the residual set the backward reuses.
    """
    batch, head, q_tokens, head_dim = q.shape
    kv_len = k.shape[2]
    bh = batch * head
    q3 = pad_tokens(q.reshape(bh, q_tokens, head_dim), config.block_q, 1)
    k3 = pad_tokens(k.reshape(bh, kv_len, head_dim), config.block_kv, 1)
    v3 = pad_tokens(v.reshape(bh, kv_len, head_dim), config.block_kv, 1)
    q_i8, sq = quantize_int8_blocks(q3, config.block_q)
    k_i8, sk = quantize_int8_blocks(k3, config.block_kv)
    v_i8, sv = quantize_int8_blocks(v3, config.block_kv)
    return (q_i8, sq), (k_i8, sk), (v_i8, sv)


@functools.partial(
    jax.jit, static_argnames=("causal", "sm_scale", "config", "interpret")
)
def int8_attention_fwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    sm_scale: float | None = None,
    config: BlockConfig | None = None,
    interpret: bool | None = None,
):
    """INT8 attention forward on [b, h, t, d] inputs (K already smoothed by
    the caller when used via `sage_attention_int8`).

    Returns (o, lse, residuals) where residuals =
    ((q_i8, sq), (k_i8, sk), (v_i8, sv)) for the int8 backward.
    """
    if interpret is None:
        interpret = use_interpret_mode()
    batch, head, q_tokens, head_dim = q.shape
    kv_len = k.shape[2]
    if config is None:
        config = default_block_config("int8", q_tokens, kv_len)
    residuals = quantize_qkv(q, k, v, config)
    o, lse = int8_attention_fwd_from_quantized(
        residuals,
        (batch, head, q_tokens, kv_len, head_dim),
        causal=causal,
        sm_scale=sm_scale,
        config=config,
        interpret=interpret,
    )
    return o, lse, residuals


@functools.partial(
    jax.jit, static_argnames=("dims", "causal", "sm_scale", "config", "interpret")
)
def int8_attention_fwd_from_quantized(
    residuals,
    dims,
    causal: bool = False,
    sm_scale: float | None = None,
    config: BlockConfig | None = None,
    interpret: bool | None = None,
):
    """Run the int8 forward from pre-quantized blocks (KV-cache reuse path)."""
    if interpret is None:
        interpret = use_interpret_mode()
    (q_i8, sq), (k_i8, sk), (v_i8, sv) = residuals
    batch, head, q_tokens, kv_len, head_dim = dims
    if config is None:
        config = default_block_config("int8", q_tokens, kv_len)
    block_q, block_kv = config.block_q, config.block_kv
    _, qk_scale = qk_scales(head_dim, sm_scale)

    bh = batch * head
    padded_q, padded_kv = q_i8.shape[1], k_i8.shape[1]
    num_q_blocks = cdiv(padded_q, block_q)
    num_kv_blocks = cdiv(padded_kv, block_kv)

    kernel = functools.partial(
        _int8_fwd_kernel,
        qk_scale=qk_scale,
        causal=causal,
        kv_len=kv_len,
        num_kv_blocks=num_kv_blocks,
        block_q=block_q,
        block_kv=block_kv,
        block_sub=min(config.kv_compute, block_kv),
    )

    sq_f32 = sq.astype(jnp.float32)
    sk_f32 = sk.astype(jnp.float32)
    sv_f32 = sv.astype(jnp.float32)

    o, lse = pl.pallas_call(
        kernel,
        grid=(bh, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, head_dim), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_kv, head_dim), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_kv, head_dim), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, head_dim), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, _LANES), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, padded_q, head_dim), jnp.float32),
            jax.ShapeDtypeStruct((bh, padded_q, _LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, head_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_i8, k_i8, v_i8, sq_f32, sk_f32, sv_f32)

    o = o[:, :q_tokens].reshape(batch, head, q_tokens, head_dim)
    lse = lse[:, :q_tokens, 0].reshape(batch, head, q_tokens)
    return o, lse
