"""Corrected-bf16 flash-attention forward (Pallas/Mosaic).

TPU-native re-design of the reference's Helion kernel
`helion_atten_bf16_fwd_training` (attention_bf16.py:107-296): online-softmax
flash attention whose P tile is rounded to bf16 so the P@V matmul runs on the
MXU at bf16 rate, with the arXiv:2510.04212 tied-max amplification (BETA rule)
preventing the exp2(S-m)~1 bf16 rounding failure that destabilizes training.

Deliberate TPU-first divergences (all documented in SURVEY.md §2.3 / §7):
  * Softmax statistics (m, l, accumulator) are f32 — on TPU the VPU runs f32
    elementwise ops at full rate, so there is no reason to hold m in bf16 as
    the reference does (attention_bf16.py:197); the *capability* — bf16 P on
    the matrix unit with corrected numerics — is preserved, since bf16-P is
    where the failure mode lives.
  * Q/K arrive in bf16 (TPU MXU-native) rather than fp16 (CUDA-native).
  * Grid is (batch*head, q_blocks, kv_blocks) with kv innermost and VMEM
    scratch carrying (m, l, acc) across kv steps; causal kv blocks that lie
    entirely above the diagonal are skipped.

Returns (O f32 [b,h,q,d], lse f32 [b,h,q]) with lse = m + log2(l) in the exp2
domain, exactly the residual contract the backward consumes
(attention_bf16.py:288-296).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantizedattention_tpu.ops.common import MASK_VALUE, pad_tokens, qk_scales, tile_mask
from quantizedattention_tpu.quantize.bf16_correction import (
    APPROX_MAX_TOL,
    BETA,
    EPS_BIAS,
    amplify_tied_max,
)
from quantizedattention_tpu.tune.config import BlockConfig, default_block_config
from quantizedattention_tpu.utils.runtime import cdiv, use_interpret_mode

_LANES = 128


def _fwd_kernel(
    qoff_ref,
    koff_ref,
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    lse_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    qk_scale: float,
    causal: bool,
    kv_len: int,
    num_kv_blocks: int,
    block_q: int,
    block_kv: int,
    block_sub: int,
    p_dtype,
    correction: str,
    beta: float,
    tol: float,
    rep: int,
):
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # global offsets make causal masking correct for sequence-sharded q/kv
    # (ring attention / context parallelism) — 0 on a single device
    k_local = kj * block_kv
    q_start = qoff_ref[0] + qi * block_q
    k_start = koff_ref[0] + k_local

    # f32 inputs must not be truncated to bf16 by the MXU in fp32 mode.
    dot_precision = (
        jax.lax.Precision.HIGHEST if p_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )

    # VPU economy: q arrives pre-scaled by qk_scale (one [t,d] pass outside
    # instead of a [bq,bkv] pass per tile), and masked entries are NOT
    # re-zeroed after exp2 — a row
    # whose running max is still MASK_VALUE gets wiped exactly when its first
    # real tile arrives, because alpha = exp2(MASK_VALUE - m_real)
    # underflows to 0 (and causal block-skip guarantees every live row
    # eventually sees a real tile).
    kv_padded = kv_len % block_kv != 0

    # Two-level kv tiling: the grid/DMA block is block_kv wide, compute runs
    # per block_sub-wide subtile so causal skipping prunes above-diagonal
    # subtiles without shrinking the (overhead-amortizing) DMA blocks.
    #
    # GQA (rep > 1): the q block carries the kv head's WHOLE q group
    # ([rep, block_q, d]); each K/V subtile residency serves all rep groups
    # (the K/V HBM stream is per kv head, not per q head — rep x less
    # traffic than repeating KV; grid axis 0 is b·h_kv). The causal mask
    # depends only on token positions, so it is computed once per subtile
    # and shared across groups.
    def _subtile(j):
        sub_local = k_local + j * block_sub
        sub_start = k_start + j * block_sub

        def _sub_body():
            k = k_ref[0, pl.ds(j * block_sub, block_sub), :]
            v = v_ref[0, pl.ds(j * block_sub, block_sub), :].astype(p_dtype)
            if causal or kv_padded:
                mask = tile_mask(
                    q_start, sub_start, block_q, block_sub, kv_len, causal,
                    k_local_start=sub_local,
                )

            for g in range(rep):
                q = q_ref[0, g]
                # S = (Q·qk_scale) Kᵀ on the MXU, f32 accumulation.
                s = jax.lax.dot_general(
                    q,
                    k,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=dot_precision,
                )

                if causal or kv_padded:
                    # Unconditional select: masking only diagonal-crossing
                    # tiles via lax.cond was measured SLOWER (7.2 vs 4.9 ms
                    # at seq 4096) — Mosaic's scf.if breaks the tile
                    # pipeline, while the iota/compare/select chain
                    # vectorizes into the exp2 pass.
                    s = jnp.where(mask, s, MASK_VALUE)

                m_prev = m_scr[g][:, :1]
                m_cur = jnp.max(s, axis=-1, keepdims=True)
                if correction == "eps":
                    # zero-cost rule: bias the row max by one bf16 ulp so
                    # every P entry lands strictly below 1.0 (exact-math
                    # invariant — any per-row max bias cancels in the
                    # normalization)
                    m_cur = m_cur + EPS_BIAS
                next_m = jnp.maximum(m_prev, m_cur)
                if correction == "beta":
                    # reference-parity rule (arXiv:2510.04212): amplify tied
                    # maxima (attention_bf16.py:241-264) — two full-tile
                    # passes
                    next_m = amplify_tied_max(s, next_m, beta=beta, tol=tol)

                p = jnp.exp2(s - next_m).astype(p_dtype)

                alpha = jnp.exp2(m_prev - next_m)
                # l sums the *rounded* P (what actually enters the PV
                # matmul), so the epilogue normalization matches the
                # accumulated mass (reference: attention_bf16.py:274).
                l_cur = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
                l_next = l_scr[g][:, :1] * alpha + l_cur

                pv = jax.lax.dot_general(
                    p,
                    v,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=dot_precision,
                )
                acc_scr[g] = acc_scr[g] * alpha + pv
                m_scr[g] = jnp.broadcast_to(next_m, m_scr.shape[1:])
                l_scr[g] = jnp.broadcast_to(l_next, l_scr.shape[1:])

        if causal:
            # Skip subtiles entirely above the diagonal.
            pl.when(q_start + block_q - 1 >= sub_start)(_sub_body)
        else:
            _sub_body()

    for j in range(block_kv // block_sub):
        _subtile(j)

    @pl.when(kj == num_kv_blocks - 1)
    def _epilogue():
        for g in range(rep):
            l = l_scr[g][:, :1]
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, g] = (acc_scr[g] / l_safe).astype(o_ref.dtype)
            # lse rides with TOKENS ON LANES: a [block_q, 1] column broadcast
            # to 128 lanes costs 128x the bytes (134 MB at (4,16,4096,64) —
            # measured as real HBM traffic); transposing to a [8, block_q]
            # row tile writes 8x tokens instead. The wrapper slices [:, 0, :].
            lse = m_scr[g][:, :1] + jnp.log2(l_safe)
            lse_ref[0, g] = jnp.broadcast_to(
                lse.reshape(1, -1), lse_ref.shape[2:]
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal",
        "sm_scale",
        "config",
        "precision",
        "correction",
        "beta",
        "tol",
        "interpret",
    ),
)
def flash_attention_fwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    sm_scale: float | None = None,
    config: BlockConfig | None = None,
    precision: str = "bf16",
    correction: str = "eps",
    beta: float = BETA,
    tol: float = APPROX_MAX_TOL,
    interpret: bool | None = None,
    q_offset: jnp.ndarray | int = 0,
    k_offset: jnp.ndarray | int = 0,
):
    """Flash-attention forward. q: [batch, head, tokens, head_dim];
    k/v: [batch, kv_head, kv_tokens, head_dim] with kv_head dividing head —
    kv_head < head is GQA-NATIVE: K/V stream through VMEM once per kv head
    and serve the whole q group (never materialize a repeated copy; the
    repeated-KV path costs rep x the K/V HBM reads, round-3 verdict next #2).

    precision: "bf16" rounds P to bf16 for the MXU (the reference's training
    path); "fp32" keeps everything f32 (oracle-grade, used by the JVP family).
    correction: "eps" (zero-cost ulp bias, default), "beta" (the reference's
    tied-max amplification rule), or "none".
    Returns (O f32, lse f32 [b, h, q_tokens]).
    """
    if interpret is None:
        interpret = use_interpret_mode()
    batch, head, q_tokens, head_dim = q.shape
    kv_head, kv_len = k.shape[1], k.shape[2]
    if head % kv_head != 0:
        raise ValueError(f"q heads ({head}) must be a multiple of kv heads ({kv_head})")
    rep = head // kv_head
    if config is None:
        config = default_block_config("bf16" if precision == "bf16" else "fp32", q_tokens, kv_len, head_dim)
    config = config.clamp_rep(rep)
    block_q, block_kv = config.block_q, config.block_kv

    if precision == "bf16":
        compute_dtype, p_dtype = jnp.bfloat16, jnp.bfloat16
    elif precision == "fp32":
        compute_dtype, p_dtype = jnp.float32, jnp.float32
    else:
        raise ValueError(f"unknown precision {precision!r}")

    _, qk_scale = qk_scales(head_dim, sm_scale)

    # pre-scale Q in f32 so the kernel's logits arrive already in the exp2
    # domain (saves one full [bq, bkv] VPU pass per tile). Layout: the q
    # group of each kv head rides as a [rep, block_q, d] block (head index
    # h = kv_head * rep + g, matching jnp.repeat(k, rep, axis=1) semantics).
    bh_kv = batch * kv_head
    q_scaled = q.astype(jnp.float32) * qk_scale
    q4 = pad_tokens(
        q_scaled.astype(compute_dtype).reshape(bh_kv, rep, q_tokens, head_dim),
        block_q, 2,
    )
    k3 = pad_tokens(k.astype(compute_dtype).reshape(bh_kv, kv_len, head_dim), block_kv, 1)
    v3 = pad_tokens(v.astype(compute_dtype).reshape(bh_kv, kv_len, head_dim), block_kv, 1)

    padded_q, padded_kv = q4.shape[2], k3.shape[1]
    num_q_blocks = cdiv(padded_q, block_q)
    num_kv_blocks = cdiv(padded_kv, block_kv)

    qoff = jnp.asarray(q_offset, jnp.int32).reshape(1)
    koff = jnp.asarray(k_offset, jnp.int32).reshape(1)

    kernel = functools.partial(
        _fwd_kernel,
        qk_scale=qk_scale,
        causal=causal,
        kv_len=kv_len,
        num_kv_blocks=num_kv_blocks,
        block_q=block_q,
        block_kv=block_kv,
        block_sub=min(config.kv_compute, block_kv),
        p_dtype=p_dtype,
        correction=correction,
        beta=beta,
        tol=tol,
        rep=rep,
    )

    o, lse = pl.pallas_call(
        kernel,
        grid=(bh_kv, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rep, block_q, head_dim), lambda b, i, j: (b, 0, i, 0)),
            pl.BlockSpec((1, block_kv, head_dim), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_kv, head_dim), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, rep, block_q, head_dim), lambda b, i, j: (b, 0, i, 0)),
            pl.BlockSpec((1, rep, 8, block_q), lambda b, i, j: (b, 0, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh_kv, rep, padded_q, head_dim), jnp.float32),
            jax.ShapeDtypeStruct((bh_kv, rep, 8, padded_q), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rep, block_q, _LANES), jnp.float32),
            pltpu.VMEM((rep, block_q, _LANES), jnp.float32),
            pltpu.VMEM((rep, block_q, head_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qoff, koff, q4, k3, v3)

    o = o[:, :, :q_tokens].reshape(batch, head, q_tokens, head_dim)
    lse = lse[:, :, 0, :q_tokens].reshape(batch, head, q_tokens)
    return o, lse
