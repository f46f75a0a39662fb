"""SageAttention3-style INT8 backward (Pallas/Mosaic) for int8 fine-tuning.

TPU-native re-design of the reference's `helion_atten_int8_hl_dot_bwd`
(attention_int8.py:264-432): recomputes S from the *forward's* quantized
Q/K blocks and scales (no re-quantization of Q/K/V — the residual contract of
attention_int8.py:58-65), then runs all four backward matmuls on the MXU.

**TPU-first matmul strategy (measured, v5e — see ops/int8_fwd.py):** Mosaic
int8->int32 dots run ~0.7x the bf16 MXU rate, so quantizing dO/dS/P to int8
(the reference's per-tile absmax, attention_int8.py:363-374, 403-405) would
buy no rate and cost VPU passes + gradient error. The int8 *residuals*
(Q/K/V payloads + scales) are kept — that is the memory/recompute contract —
and every matmul runs on bf16 operands with f32 accumulation: the int8-valued
Q/K payloads cast to bf16 exactly; dO/dS/P stay bf16 (same precision class as
this repo's fast bf16 backward, flash_bwd.py).

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
from quantizedattention_tpu.tune.config import BlockConfig
from quantizedattention_tpu.utils.runtime import cdiv, use_interpret_mode

_LANES = 128


def _bf_dot(a, b, dims):
    """bf16-rate MXU matmul with f32 accumulation (exact on int8 payloads)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        (dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _recompute_p_int8(q_i8, k_i8, sq, sk, lse, mask, qk_scale):
    s = _bf_dot(q_i8, k_i8, ((1,), (1,))) * (sq * sk * qk_scale)
    p = jnp.exp2(s - lse)
    return jnp.where(mask, p, 0.0)


def _int8_dkv_kernel(
    qoff_ref, koff_ref,
    q_ref, k_ref, v_ref, do_ref, sq_ref, sk_ref, sv_ref,
    lse_ref, di_ref, dk_ref, dv_ref, dk_scr, dv_scr,
    *, sm_scale, qk_scale, causal, kv_len, num_q_blocks, block_q, block_kv,
    rep,
):
    b = pl.program_id(0)
    kj = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    k_local = kj * block_kv
    q_start = qoff_ref[0] + qi * block_q
    k_start = koff_ref[0] + k_local

    def _body():
        sk = sk_ref[b, kj]
        sv = sv_ref[b, kj]
        k = k_ref[0]
        v = v_ref[0]
        mask = tile_mask(q_start, k_start, block_q, block_kv, kv_len, causal,
                         k_local_start=k_local)
        # GQA: one int8 K/V residency serves the whole q group; the group's
        # dK/dV contributions accumulate in the same kv-tile scratch (the
        # mathematical dK per kv head sums over its q group).
        for g in range(rep):
            sq = sq_ref[b, g, qi]
            lse = lse_ref[0, g][:, :1]
            di = di_ref[0, g][:, :1]
            do = do_ref[0, g]

            p = _recompute_p_int8(q_ref[0, g], k, sq, sk, lse, mask, qk_scale)

            # dV += Pᵀ dO: P is near-uniform on typical data, so the
            # contraction averages dO toward zero and int8 noise would swamp
            # the small signal — SageAttention3 likewise keeps the dV matmul
            # in half precision (arXiv:2505.11594); here *all* operands are
            # bf16 (module doc).
            dv_scr[...] += _bf_dot(p, do, ((0,), (0,)))
            # dP = dO Vᵀ (contract head_dim); V payload is exact int8-in-bf16
            dp = _bf_dot(do, v, ((1,), (1,))) * sv
            ds = p * (dp - di) * sm_scale
            # dK += dSᵀ Q (contract q); Q payload exact, per-block scale sq
            dk_scr[...] += _bf_dot(ds, q_ref[0, g], ((0,), (0,))) * sq

    if causal:
        pl.when(q_start + block_q - 1 >= k_start)(_body)
    else:
        _body()

    @pl.when(qi == num_q_blocks - 1)
    def _epilogue():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _int8_dq_kernel(
    qoff_ref, koff_ref,
    q_ref, k_ref, v_ref, do_ref, sq_ref, sk_ref, sv_ref,
    lse_ref, di_ref, k_mean_ref, dq_ref, dq_scr,
    *, sm_scale, qk_scale, causal, kv_len, num_kv_blocks, block_q, block_kv,
    rep,
):
    b = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    k_local = kj * block_kv
    q_start = qoff_ref[0] + qi * block_q
    k_start = koff_ref[0] + k_local

    def _body():
        sk = sk_ref[b, kj]
        sv = sv_ref[b, kj]
        k = k_ref[0]
        v = v_ref[0]
        mask = tile_mask(q_start, k_start, block_q, block_kv, kv_len, causal,
                         k_local_start=k_local)
        for g in range(rep):  # GQA: one K/V residency serves the q group
            sq = sq_ref[b, g, qi]
            lse = lse_ref[0, g][:, :1]
            di = di_ref[0, g][:, :1]

            p = _recompute_p_int8(q_ref[0, g], k, sq, sk, lse, mask, qk_scale)
            dp = _bf_dot(do_ref[0, g], v, ((1,), (1,))) * sv
            ds = p * (dp - di) * sm_scale
            # dQ += dS K_smoothed (contract kv; K payload exact
            # int8-in-bf16) ...
            dq = _bf_dot(ds, k, ((1,), (0,))) * sk
            # ... + rowsum(dS)·k_mean — undoes K-smoothing in the gradient
            # (dS rows sum to ~0, so this term is a small correction;
            # SageAttention3).
            dq += jnp.sum(ds, axis=-1, keepdims=True) * k_mean_ref[0]
            dq_scr[g] += dq

    if causal:
        pl.when(q_start + block_q - 1 >= k_start)(_body)
    else:
        _body()

    @pl.when(kj == num_kv_blocks - 1)
    def _epilogue():
        for g in range(rep):
            dq_ref[0, g] = dq_scr[g].astype(dq_ref.dtype)


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
    q_offset: jnp.ndarray | int = 0,
    k_offset: jnp.ndarray | int = 0,
):
    """INT8 backward from the forward's quantized residuals.

    residuals: ((q_i8, sq), (k_i8, sk), (v_i8, sv)) on padded [b·h, t, d] /
    [b·h_kv, t, d] layouts (k smoothed), as produced by int8_fwd.quantize_qkv.
    GQA (h_kv < h): dk/dv come back on the kv-head count, group-summed
    inside the dKV kernel.
    k_mean: [b, h_kv, 1, d] token-mean of the *original* K.
    dims: (batch, head, q_tokens, kv_len, head_dim).
    Returns (dq, dk, dv) in f32 on [b, h(, h_kv), t, d].
    """
    if interpret is None:
        interpret = use_interpret_mode()
    (q_i8, sq), (k_i8, sk), (v_i8, sv) = residuals
    batch, head, q_tokens, kv_len, head_dim = dims
    del config  # tiling is fully determined by the residuals (below)
    sm_scale, qk_scale = qk_scales(head_dim, sm_scale)

    bh = batch * head
    bh_kv = k_i8.shape[0]
    if bh % bh_kv != 0:
        raise ValueError(f"q rows ({bh}) must be a multiple of kv rows ({bh_kv})")
    rep = bh // bh_kv
    kv_head = bh_kv // batch
    f32 = jnp.float32
    padded_q, padded_kv = q_i8.shape[1], k_i8.shape[1]
    # The backward reuses the forward's quantization, so its tiling is pinned
    # to the quantization grain, read off the scale tables (the reference
    # threads (Bq,Bkv) through ctx.args for the same reason,
    # attention_int8.py:65,81). The forward's large DMA block_kv is
    # irrelevant here — a [block_q, block_kv] P tile at block_kv=8192 would
    # blow VMEM; the grain (default 1024) is the measured bwd optimum.
    block_q = padded_q // sq.shape[1]
    block_kv = padded_kv // sk.shape[1]
    num_q_blocks = cdiv(padded_q, block_q)
    num_kv_blocks = cdiv(padded_kv, block_kv)

    do4 = pad_tokens(do.astype(f32).reshape(bh_kv, rep, q_tokens, head_dim), block_q, 2)
    o4 = pad_tokens(o.astype(f32).reshape(bh_kv, rep, q_tokens, head_dim), block_q, 2)

    di = jnp.sum(do4 * o4, axis=-1)
    di_b = jnp.broadcast_to(di[..., None], (*di.shape, _LANES))
    lse4 = pad_tokens(lse.astype(f32).reshape(bh_kv, rep, q_tokens), block_q, 2)
    lse_b = jnp.broadcast_to(lse4[..., None], (*lse4.shape, _LANES))
    k_mean3 = k_mean.astype(f32).reshape(bh_kv, 1, head_dim)
    q_i8_4 = q_i8.reshape(bh_kv, rep, padded_q, head_dim)

    common = dict(
        sm_scale=sm_scale,
        qk_scale=qk_scale,
        causal=causal,
        kv_len=kv_len,
        block_q=block_q,
        block_kv=block_kv,
        rep=rep,
    )

    sq_f32 = sq.astype(f32).reshape(bh_kv, rep, -1)
    sk_f32, sv_f32 = sk.astype(f32), sv.astype(f32)
    qoff = jnp.asarray(q_offset, jnp.int32).reshape(1)
    koff = jnp.asarray(k_offset, jnp.int32).reshape(1)

    # --- dKV pass: grid (bh_kv, kv, q) ---
    q_spec = pl.BlockSpec((1, rep, block_q, head_dim), lambda b, j, i: (b, 0, i, 0))
    kv_spec = pl.BlockSpec((1, block_kv, head_dim), lambda b, j, i: (b, j, 0))
    lane_spec = pl.BlockSpec((1, rep, block_q, _LANES), lambda b, j, i: (b, 0, i, 0))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_int8_dkv_kernel, num_q_blocks=num_q_blocks, **common),
        grid=(bh_kv, num_kv_blocks, num_q_blocks),
        in_specs=[smem_spec, smem_spec, q_spec, kv_spec, kv_spec, q_spec,
                  smem_spec, smem_spec, smem_spec, lane_spec, lane_spec],
        out_specs=[kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh_kv, padded_kv, head_dim), f32),
            jax.ShapeDtypeStruct((bh_kv, padded_kv, head_dim), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, head_dim), f32),
            pltpu.VMEM((block_kv, head_dim), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qoff, koff, q_i8_4, k_i8, v_i8, do4, sq_f32, sk_f32, sv_f32, lse_b, di_b)

    # --- dQ pass: grid (bh_kv, q, kv) ---
    q_spec_q = pl.BlockSpec((1, rep, block_q, head_dim), lambda b, i, j: (b, 0, i, 0))
    kv_spec_q = pl.BlockSpec((1, block_kv, head_dim), lambda b, i, j: (b, j, 0))
    lane_spec_q = pl.BlockSpec((1, rep, block_q, _LANES), lambda b, i, j: (b, 0, i, 0))
    km_spec = pl.BlockSpec((1, 1, head_dim), lambda b, i, j: (b, 0, 0))

    (dq,) = pl.pallas_call(
        functools.partial(_int8_dq_kernel, num_kv_blocks=num_kv_blocks, **common),
        grid=(bh_kv, num_q_blocks, num_kv_blocks),
        in_specs=[smem_spec, smem_spec, q_spec_q, kv_spec_q, kv_spec_q,
                  q_spec_q, smem_spec, smem_spec, smem_spec, lane_spec_q,
                  lane_spec_q, km_spec],
        out_specs=[q_spec_q],
        out_shape=[jax.ShapeDtypeStruct((bh_kv, rep, padded_q, head_dim), f32)],
        scratch_shapes=[pltpu.VMEM((rep, block_q, head_dim), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qoff, koff, q_i8_4, k_i8, v_i8, do4, sq_f32, sk_f32, sv_f32, lse_b, di_b, k_mean3)

    dq = dq[:, :, :q_tokens].reshape(batch, head, q_tokens, head_dim)
    dk = dk[:, :kv_len].reshape(batch, kv_head, kv_len, head_dim)
    dv = dv[:, :kv_len].reshape(batch, kv_head, kv_len, head_dim)
    return dq, dk, dv
