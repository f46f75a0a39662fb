"""fp32 FlashAttention-2 Algorithm-4 backward (Pallas/Mosaic).

TPU-native re-design of the reference's `helion_flash_atten_2_algo_4_bwd`
(attention_bf16.py:299-448), split into two race-free kernels:

  * dKV kernel — grid (b·h, kv_blocks, q_blocks), q innermost; accumulates
    dK and dV for one kv tile in VMEM scratch across all q tiles.
  * dQ kernel — grid (b·h, q_blocks, kv_blocks), kv innermost; accumulates
    dQ for one q tile in VMEM scratch across all kv tiles.

This removes the reference's dq read-modify-write race (different k-tile
programs read+write the same dq rows through HBM, attention_bf16.py:427-432 —
SURVEY.md §2.3 Q2): on TPU each output element is owned by exactly one
program.

Math fixes vs the reference (SURVEY.md §2.3 Q1): FA2 Algorithm 4 derives
dS = P ∘ (dP − D); the reference multiplies by the *logits* S instead
(attention_bf16.py:421). We implement the correct formula and validate
against jax.grad of the fp32 oracle. D = rowsum(dO ∘ O) is precomputed once
outside the kernels and shared by both passes.

Everything is computed in f32 (the reference upcasts likewise,
attention_bf16.py:342-344); MXU dots run at Precision.HIGHEST by default so
the backward really is fp32, with a `fast` flag to allow bf16-rate passes.
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


def _recompute_p(q_scaled, k, lse, qk_scale, precision, causal, kv_padded,
                 q_start, k_start, k_local, block_q, block_kv, kv_len):
    """P = exp2(S_scaled − lse) recomputed on the MXU.

    q arrives pre-scaled by qk_scale, so no per-tile scale pass is needed;
    masking runs only on tiles the diagonal / kv padding crosses, and masked
    logits (MASK_VALUE) underflow to exactly 0 through exp2 since lse is
    finite — no second zeroing pass.
    """
    s = jax.lax.dot_general(
        q_scaled, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )

    if causal or kv_padded:
        mask = tile_mask(
            q_start, k_start, block_q, block_kv, kv_len, causal,
            k_local_start=k_local,
        )
        s = jnp.where(mask, s, MASK_VALUE)
    return jnp.exp2(s - lse)


def _dkv_kernel(
    qoff_ref, koff_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref, dk_scr, dv_scr,
    *, sm_scale, qk_scale, causal, kv_len, num_q_blocks, block_q, block_kv,
    precision, rep,
):
    kj = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    k_local = kj * block_kv
    q_start = qoff_ref[0] + qi * block_q
    k_start = koff_ref[0] + k_local

    kv_padded = kv_len % block_kv != 0

    def _body():
        k = k_ref[0]
        v = v_ref[0]
        # GQA: the group's dK/dV contributions accumulate into the SAME
        # kv-tile scratch (the mathematical dK for a kv head is the sum over
        # its q group) — one K/V residency serves all rep groups and the
        # group reduction costs no extra HBM traffic.
        for g in range(rep):
            q = q_ref[0, g]      # pre-scaled by qk_scale
            do = do_ref[0, g]    # pre-scaled by sm_scale
            lse = lse_ref[0, g][:, :1]
            di = di_ref[0, g][:, :1]  # rowsum(do_scaled * o) = sm_scale * D

            p = _recompute_p(q, k, lse, qk_scale, precision, causal, kv_padded,
                             q_start, k_start, k_local, block_q, block_kv, kv_len)

            # dV += Pᵀ dO_scaled  (contract over q; /sm_scale at the epilogue)
            dv_scr[...] += jax.lax.dot_general(
                p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=precision,
            )
            # dP_scaled = dO_scaled Vᵀ  (contract over head_dim)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                precision=precision,
            )
            # sm_scale already folded into dp and di
            ds = p * (dp - di)
            # dK += dSᵀ Q_scaled  (contract over q; /qk_scale at the epilogue)
            dk_scr[...] += jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=precision,
            )

    if causal:
        pl.when(q_start + block_q - 1 >= k_start)(_body)
    else:
        _body()

    @pl.when(qi == num_q_blocks - 1)
    def _epilogue():
        # undo the folded input scales (tiny [block_kv, d] passes)
        dk_ref[0] = (dk_scr[...] * (1.0 / qk_scale)).astype(dk_ref.dtype)
        dv_ref[0] = (dv_scr[...] * (1.0 / sm_scale)).astype(dv_ref.dtype)


def _dq_kernel(
    qoff_ref, koff_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, dq_scr,
    *, sm_scale, qk_scale, causal, kv_len, num_kv_blocks, block_q, block_kv,
    precision, rep,
):
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    k_local = kj * block_kv
    q_start = qoff_ref[0] + qi * block_q
    k_start = koff_ref[0] + k_local

    kv_padded = kv_len % block_kv != 0

    def _body():
        k = k_ref[0]
        v = v_ref[0]
        for g in range(rep):  # GQA: one K/V residency serves the q group
            q = q_ref[0, g]      # pre-scaled by qk_scale
            do = do_ref[0, g]    # pre-scaled by sm_scale
            lse = lse_ref[0, g][:, :1]
            di = di_ref[0, g][:, :1]

            p = _recompute_p(q, k, lse, qk_scale, precision, causal, kv_padded,
                             q_start, k_start, k_local, block_q, block_kv, kv_len)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                precision=precision,
            )
            ds = p * (dp - di)  # sm_scale folded into dp/di
            # dQ += dS K  (contract over kv; K unscaled, so dq needs no fixup)
            dq_scr[g] += jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=precision,
            )

    if causal:
        pl.when(q_start + block_q - 1 >= k_start)(_body)
    else:
        _body()

    @pl.when(kj == num_kv_blocks - 1)
    def _epilogue():
        for g in range(rep):
            dq_ref[0, g] = dq_scr[g].astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "config", "fast", "interpret"),
)
def flash_attention_bwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    o: jnp.ndarray,
    lse: jnp.ndarray,
    do: jnp.ndarray,
    causal: bool = False,
    sm_scale: float | None = None,
    config: BlockConfig | None = None,
    fast: bool = False,
    interpret: bool | None = None,
    q_offset: jnp.ndarray | int = 0,
    k_offset: jnp.ndarray | int = 0,
):
    """fp32 FA2 backward. Residuals (q,k,v,O,lse) match the forward's outputs.

    k/v may carry fewer heads than q (GQA): dk/dv come back on the kv-head
    count — the group-sum reduction runs INSIDE the dKV kernel (one K/V
    residency serves the whole q group, like the forward).

    lse: [b, h, q_tokens] in the exp2 domain (m + log2 l). Returns
    (dq, dk, dv) in f32. `fast=True` lets the MXU run the recompute matmuls
    at bf16 rate (DEFAULT precision) instead of true f32.
    """
    if interpret is None:
        interpret = use_interpret_mode()
    batch, head, q_tokens, head_dim = q.shape
    kv_head, kv_len = k.shape[1], k.shape[2]
    if head % kv_head != 0:
        raise ValueError(f"q heads ({head}) must be a multiple of kv heads ({kv_head})")
    rep = head // kv_head
    if config is None:
        config = default_block_config("fp32", q_tokens, kv_len, head_dim)
    config = config.clamp_rep(rep)
    block_q, block_kv = config.block_q_bwd, config.block_kv_bwd
    sm_scale, qk_scale = qk_scales(head_dim, sm_scale)
    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST

    bh_kv = batch * kv_head
    f32 = jnp.float32
    # fold the logit scale into Q and the gradient scale into dO once here
    # (saves two full [bq, bkv] VPU passes per tile; un-folded at epilogues)
    q4 = pad_tokens((q.astype(f32) * qk_scale).reshape(bh_kv, rep, q_tokens, head_dim), block_q, 2)
    k3 = pad_tokens(k.astype(f32).reshape(bh_kv, kv_len, head_dim), block_kv, 1)
    v3 = pad_tokens(v.astype(f32).reshape(bh_kv, kv_len, head_dim), block_kv, 1)
    do4 = pad_tokens((do.astype(f32) * sm_scale).reshape(bh_kv, rep, q_tokens, head_dim), block_q, 2)
    o4 = pad_tokens(o.astype(f32).reshape(bh_kv, rep, q_tokens, head_dim), block_q, 2)

    # D = rowsum(dO ∘ O), shared by both passes (the reference recomputes it
    # per tile, attention_bf16.py:416); broadcast to 128 lanes for TPU tiling.
    di = jnp.sum(do4 * o4, axis=-1)
    di_b = jnp.broadcast_to(di[..., None], (*di.shape, _LANES))
    lse4 = pad_tokens(lse.astype(f32).reshape(bh_kv, rep, q_tokens), block_q, 2)
    lse_b = jnp.broadcast_to(lse4[..., None], (*lse4.shape, _LANES))

    padded_q, padded_kv = q4.shape[2], k3.shape[1]
    num_q_blocks = cdiv(padded_q, block_q)
    num_kv_blocks = cdiv(padded_kv, block_kv)

    common = dict(
        sm_scale=sm_scale,
        qk_scale=qk_scale,
        causal=causal,
        kv_len=kv_len,
        block_q=block_q,
        block_kv=block_kv,
        precision=precision,
        rep=rep,
    )

    qoff = jnp.asarray(q_offset, jnp.int32).reshape(1)
    koff = jnp.asarray(k_offset, jnp.int32).reshape(1)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    q_spec = pl.BlockSpec((1, rep, block_q, head_dim), lambda b, j, i: (b, 0, i, 0))
    kv_spec = pl.BlockSpec((1, block_kv, head_dim), lambda b, j, i: (b, j, 0))
    lane_spec = pl.BlockSpec((1, rep, block_q, _LANES), lambda b, j, i: (b, 0, i, 0))

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, num_q_blocks=num_q_blocks, **common),
        grid=(bh_kv, num_kv_blocks, num_q_blocks),
        in_specs=[smem_spec, smem_spec, q_spec, kv_spec, kv_spec, q_spec, lane_spec, lane_spec],
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
    )(qoff, koff, q4, k3, v3, do4, lse_b, di_b)

    q_spec_q = pl.BlockSpec((1, rep, block_q, head_dim), lambda b, i, j: (b, 0, i, 0))
    kv_spec_q = pl.BlockSpec((1, block_kv, head_dim), lambda b, i, j: (b, j, 0))
    lane_spec_q = pl.BlockSpec((1, rep, block_q, _LANES), lambda b, i, j: (b, 0, i, 0))

    (dq,) = pl.pallas_call(
        functools.partial(_dq_kernel, num_kv_blocks=num_kv_blocks, **common),
        grid=(bh_kv, num_q_blocks, num_kv_blocks),
        in_specs=[smem_spec, smem_spec, q_spec_q, kv_spec_q, kv_spec_q, q_spec_q, lane_spec_q, lane_spec_q],
        out_specs=[q_spec_q],
        out_shape=[jax.ShapeDtypeStruct((bh_kv, rep, padded_q, head_dim), f32)],
        scratch_shapes=[pltpu.VMEM((rep, block_q, head_dim), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qoff, koff, q4, k3, v3, do4, lse_b, di_b)

    dq = dq[:, :, :q_tokens].reshape(batch, head, q_tokens, head_dim)
    dk = dk[:, :kv_len].reshape(batch, kv_head, kv_len, head_dim)
    dv = dv[:, :kv_len].reshape(batch, kv_head, kv_len, head_dim)
    return dq, dk, dv
