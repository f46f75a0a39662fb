"""SageAttention3-style INT8 backward (Pallas/Mosaic) for int8 fine-tuning.

TPU-native re-design of the reference's `helion_atten_int8_hl_dot_bwd`
(attention_int8.py:264-432): recomputes S from the *forward's* quantized
Q/K blocks and scales (no re-quantization of Q/K/V — the residual contract of
attention_int8.py:58-65), then runs all four backward matmuls on the MXU in
int8 with int32 accumulation, quantizing P, dO, and dS per tile with
symmetric absmax/127.

Structure: two race-free kernels like the fp32 backward —
  * dKV: grid (b·h, kv_blocks, q_blocks), accumulates dK/dV in VMEM scratch;
  * dQ : grid (b·h, q_blocks, kv_blocks), accumulates dQ in VMEM scratch,
    adding the K-smoothing compensation rowsum(dS)·k_mean per q row
    (SageAttention3; the reference's version indexes k_mean by the wrong
    axis, attention_int8.py:408-410 — SURVEY.md §2.3 Q3).

Math fixes vs the reference (SURVEY.md §2.3): dS = P ∘ (dP − D) (not S ∘ ·,
Q1); gradients scaled by sm_scale, not the exp2-domain qk_scale; distinct
q/kv token counts are handled correctly (the reference's dk/dv indexing only
works when they coincide, Q5). Validated against jax.grad of the fp32 oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantizedattention_tpu.ops.common import pad_tokens, qk_scales, tile_mask
from quantizedattention_tpu.tune.config import BlockConfig, default_block_config
from quantizedattention_tpu.utils.runtime import cdiv, use_interpret_mode

_LANES = 128


def _int8_dot(a_i8, b_i8, dims):
    return jax.lax.dot_general(
        a_i8, b_i8, (dims, ((), ())), preferred_element_type=jnp.int32
    )


def _row_quant(x, lo=-127.0, hi=127.0):
    """Per-row absmax/127 int8 quantization — rows survive contractions over
    columns, so the row scale factors exactly out of dS@K and dO@Vᵀ (a
    granularity upgrade over the reference's per-tile scales,
    attention_int8.py:363-374, at zero extra matmul cost)."""
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-12) / 127.0
    x_i8 = jnp.clip(jnp.round(x / s), lo, hi).astype(jnp.int8)
    return x_i8, s


def _col_quant(x, lo=-127.0, hi=127.0):
    """Per-column absmax/127 int8 quantization — columns (kv index) survive
    the contraction over q in dV = Pᵀ dO and dK = dSᵀ Q, so the column scale
    factors exactly out of those matmuls."""
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=0, keepdims=True), 1e-12) / 127.0
    x_i8 = jnp.clip(jnp.round(x / s), lo, hi).astype(jnp.int8)
    return x_i8, s


def _recompute_p_int8(q_i8, k_i8, sq, sk, lse, mask, qk_scale):
    s = _int8_dot(q_i8, k_i8, ((1,), (1,))).astype(jnp.float32) * (sq * sk * qk_scale)
    p = jnp.exp2(s - lse)
    return jnp.where(mask, p, 0.0)


def _int8_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, sq_ref, sk_ref, sv_ref,
    lse_ref, di_ref, dk_ref, dv_ref, dk_scr, dv_scr,
    *, sm_scale, qk_scale, causal, kv_len, num_q_blocks, block_q, block_kv,
):
    b = pl.program_id(0)
    kj = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q_start = qi * block_q
    k_start = kj * block_kv

    def _body():
        sq = sq_ref[b, qi]
        sk = sk_ref[b, kj]
        sv = sv_ref[b, kj]
        lse = lse_ref[0][:, :1]
        di = di_ref[0][:, :1]
        do = do_ref[0]

        mask = tile_mask(q_start, k_start, block_q, block_kv, kv_len, causal)
        p = _recompute_p_int8(q_ref[0], k_ref[0], sq, sk, lse, mask, qk_scale)

        # dV += Pᵀ dO in bf16: P is near-uniform on typical data, so the
        # contraction averages dO toward zero and int8 noise would swamp the
        # small signal — SageAttention3 likewise keeps the dV matmul in half
        # precision while quantizing the rest (arXiv:2505.11594).
        dv_scr[...] += jax.lax.dot_general(
            p.astype(jnp.bfloat16), do.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        # dP = dO Vᵀ (int8, contract head_dim) — per-row dO scale factors out
        do_i8r, sdo_row = _row_quant(do)
        dp = _int8_dot(do_i8r, v_ref[0], ((1,), (1,))).astype(jnp.float32) * (sdo_row * sv)
        ds = p * (dp - di) * sm_scale
        ds_i8, sds_col = _col_quant(ds)
        # dK += dSᵀ Q (int8, contract q)
        dk_scr[...] += (
            _int8_dot(ds_i8, q_ref[0], ((0,), (0,))).astype(jnp.float32)
            * (jnp.transpose(sds_col) * sq)
        )

    if causal:
        pl.when(q_start + block_q - 1 >= k_start)(_body)
    else:
        _body()

    @pl.when(qi == num_q_blocks - 1)
    def _epilogue():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _int8_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, sq_ref, sk_ref, sv_ref,
    lse_ref, di_ref, k_mean_ref, dq_ref, dq_scr,
    *, sm_scale, qk_scale, causal, kv_len, num_kv_blocks, block_q, block_kv,
):
    b = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q_start = qi * block_q
    k_start = kj * block_kv

    def _body():
        sq = sq_ref[b, qi]
        sk = sk_ref[b, kj]
        sv = sv_ref[b, kj]
        lse = lse_ref[0][:, :1]
        di = di_ref[0][:, :1]

        mask = tile_mask(q_start, k_start, block_q, block_kv, kv_len, causal)
        p = _recompute_p_int8(q_ref[0], k_ref[0], sq, sk, lse, mask, qk_scale)
        # per-row scales factor exactly out of both q-row-preserving matmuls
        do_i8r, sdo_row = _row_quant(do_ref[0])
        dp = _int8_dot(do_i8r, v_ref[0], ((1,), (1,))).astype(jnp.float32) * (sdo_row * sv)
        ds = p * (dp - di) * sm_scale
        ds_i8, sds_row = _row_quant(ds)
        # dQ += dS K_smoothed (int8, contract kv) ...
        dq = _int8_dot(ds_i8, k_ref[0], ((1,), (0,))).astype(jnp.float32) * (sds_row * sk)
        # ... + rowsum(dS)·k_mean — undoes K-smoothing in the gradient
        # (exact for unquantized dS since its rows sum to 0; SageAttention3).
        dq += jnp.sum(ds, axis=-1, keepdims=True) * k_mean_ref[0]
        dq_scr[...] += dq

    if causal:
        pl.when(q_start + block_q - 1 >= k_start)(_body)
    else:
        _body()

    @pl.when(kj == num_kv_blocks - 1)
    def _epilogue():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("dims", "causal", "sm_scale", "config", "interpret")
)
def int8_attention_bwd(
    residuals,
    k_mean: jnp.ndarray,
    o: jnp.ndarray,
    lse: jnp.ndarray,
    do: jnp.ndarray,
    dims,
    causal: bool = False,
    sm_scale: float | None = None,
    config: BlockConfig | None = None,
    interpret: bool | None = None,
):
    """INT8 backward from the forward's quantized residuals.

    residuals: ((q_i8, sq), (k_i8, sk), (v_i8, sv)) on padded [b·h, t, d]
    layouts (k smoothed), as produced by int8_fwd.quantize_qkv.
    k_mean: [b, h, 1, d] token-mean of the *original* K.
    dims: (batch, head, q_tokens, kv_len, head_dim).
    Returns (dq, dk, dv) in f32 on [b, h, t, d].
    """
    if interpret is None:
        interpret = use_interpret_mode()
    (q_i8, sq), (k_i8, sk), (v_i8, sv) = residuals
    batch, head, q_tokens, kv_len, head_dim = dims
    if config is None:
        config = default_block_config("int8", q_tokens, kv_len)
    # The backward reuses the forward's quantization, so its tiling is pinned
    # to the forward block sizes (the reference threads (Bq,Bkv) through
    # ctx.args for the same reason, attention_int8.py:65,81).
    block_q, block_kv = config.block_q, config.block_kv
    sm_scale, qk_scale = qk_scales(head_dim, sm_scale)

    bh = batch * head
    f32 = jnp.float32
    padded_q, padded_kv = q_i8.shape[1], k_i8.shape[1]
    num_q_blocks = cdiv(padded_q, block_q)
    num_kv_blocks = cdiv(padded_kv, block_kv)

    do3 = pad_tokens(do.astype(f32).reshape(bh, q_tokens, head_dim), block_q, 1)
    o3 = pad_tokens(o.astype(f32).reshape(bh, q_tokens, head_dim), block_q, 1)

    di = jnp.sum(do3 * o3, axis=-1)
    di_b = jnp.broadcast_to(di[..., None], (*di.shape, _LANES))
    lse3 = pad_tokens(lse.astype(f32).reshape(bh, q_tokens), block_q, 1)
    lse_b = jnp.broadcast_to(lse3[..., None], (*lse3.shape, _LANES))
    k_mean3 = jnp.broadcast_to(
        k_mean.astype(f32).reshape(batch * head, 1, head_dim), (bh, 1, head_dim)
    )

    common = dict(
        sm_scale=sm_scale,
        qk_scale=qk_scale,
        causal=causal,
        kv_len=kv_len,
        block_q=block_q,
        block_kv=block_kv,
    )

    sq_f32, sk_f32, sv_f32 = sq.astype(f32), sk.astype(f32), sv.astype(f32)

    # --- dKV pass: grid (bh, kv, q) ---
    q_spec = pl.BlockSpec((1, block_q, head_dim), lambda b, j, i: (b, i, 0))
    kv_spec = pl.BlockSpec((1, block_kv, head_dim), lambda b, j, i: (b, j, 0))
    lane_spec = pl.BlockSpec((1, block_q, _LANES), lambda b, j, i: (b, i, 0))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_int8_dkv_kernel, num_q_blocks=num_q_blocks, **common),
        grid=(bh, num_kv_blocks, num_q_blocks),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, smem_spec, smem_spec, smem_spec, lane_spec, lane_spec],
        out_specs=[kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, padded_kv, head_dim), f32),
            jax.ShapeDtypeStruct((bh, padded_kv, head_dim), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, head_dim), f32),
            pltpu.VMEM((block_kv, head_dim), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_i8, k_i8, v_i8, do3, sq_f32, sk_f32, sv_f32, lse_b, di_b)

    # --- dQ pass: grid (bh, q, kv) ---
    q_spec_q = pl.BlockSpec((1, block_q, head_dim), lambda b, i, j: (b, i, 0))
    kv_spec_q = pl.BlockSpec((1, block_kv, head_dim), lambda b, i, j: (b, j, 0))
    lane_spec_q = pl.BlockSpec((1, block_q, _LANES), lambda b, i, j: (b, i, 0))
    km_spec = pl.BlockSpec((1, 1, head_dim), lambda b, i, j: (b, 0, 0))

    (dq,) = pl.pallas_call(
        functools.partial(_int8_dq_kernel, num_kv_blocks=num_kv_blocks, **common),
        grid=(bh, num_q_blocks, num_kv_blocks),
        in_specs=[q_spec_q, kv_spec_q, kv_spec_q, q_spec_q, smem_spec, smem_spec, smem_spec, lane_spec_q, lane_spec_q, km_spec],
        out_specs=[q_spec_q],
        out_shape=[jax.ShapeDtypeStruct((bh, padded_q, head_dim), f32)],
        scratch_shapes=[pltpu.VMEM((block_q, head_dim), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_i8, k_i8, v_i8, do3, sq_f32, sk_f32, sv_f32, lse_b, di_b, k_mean3)

    dq = dq[:, :q_tokens].reshape(batch, head, q_tokens, head_dim)
    dk = dk[:, :kv_len].reshape(batch, head, kv_len, head_dim)
    dv = dv[:, :kv_len].reshape(batch, head, kv_len, head_dim)
    return dq, dk, dv
