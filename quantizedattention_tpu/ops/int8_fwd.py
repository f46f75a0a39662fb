"""SageAttention3-style INT8 flash-attention forward (Pallas/Mosaic).

TPU-native re-design of the reference's `helion_atten_int8_hl_dot_fwd`
(attention_int8.py:97-262): per-block symmetric int8 quantization of Q/K/V
fused into a single Pallas pass, QKᵀ and PV matmuls on int8 payloads, online
softmax in f32.

**TPU-first matmul strategy (measured, v5e; reconciled round 5 —
experiments/int8_mxu_rate.py, slope-timed):** `dot(int8, int8) -> int32`
runs at 0.22-0.67x the bf16 MXU rate for contraction depths 64-1024 and
overtakes bf16 (1.40x) only at depth ~4096 — deeper than any dot in these
kernels (QK^T contracts d=64/128, PV contracts the <=1024-row kv subtile).
Unlike CUDA tensor cores there is no int8 rate advantage to chase here. Integer payloads in
[-127, 127] are *exactly* representable in bf16 (8-bit mantissa), their
products (< 2^14) are exact, and the MXU accumulates in f32 where integer
sums below 2^24 stay exact — so every "int8" matmul here casts the int8
payload to bf16 and runs at full bf16 rate with bit-identical integer
results. The reference's `hl.dot(int8, int8)` (attention_int8.py:197) maps
to CUDA hardware reality; this maps to TPU hardware reality.

For the same reason P is NOT quantized to int8 (the reference's per-q-row
sp = exp2(rowmax − m)/127, attention_int8.py:227-237): SageAttention3
quantizes P to feed FP4/int8 tensor cores; on the TPU MXU the PV matmul
already runs at the same rate with P in bf16, so quantizing P would add VPU
work and quantization error for zero rate gain. P here is the bf16
exp2(s − m) tile — strictly more accurate than the reference.

Structural fixes vs the reference (SURVEY.md §2.3):
  * Q4 — the reference flattens [b,h,t,d] to [b·h·t, d] and lets softmax mix
    keys across batches and heads (attention_int8.py:129-136); here attention
    is per-(batch, head): grid (b·h, q_blocks, kv_blocks).
  * Q7 — the reference re-quantizes Q on every kv iteration
    (attention_int8.py:178-186); here Q/K/V are quantized once, per block,
    in one fused Pallas pass (`quantize_int8_blocks_fused`) whose block
    granularity equals the kernel's (the reference ties them the same way by
    threading (Bq,Bkv) to backward).
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

from quantizedattention_tpu.ops.common import pad_tokens, qk_scales, tile_mask
from quantizedattention_tpu.quantize.bf16_correction import EPS_BIAS
from quantizedattention_tpu.quantize.int8 import (
    quantize_int8_blocks_fused,
    quantize_qkv_one_pass,
)
from quantizedattention_tpu.tune.config import BlockConfig, default_block_config
from quantizedattention_tpu.utils.runtime import cdiv, use_interpret_mode

_LANES = 128


def _int8_fwd_kernel(
    qoff_ref, koff_ref,
    q_ref, k_ref, v_ref, sq_ref, sk_ref, sv_ref,
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, qk_scale, causal, kv_len, num_kv_blocks, block_q, block_kv, block_sub,
    rep,
):
    b = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # global token positions (sequence-shard offsets — causal stays correct
    # under ring / all-gather context parallelism, like flash_fwd)
    q_start = qoff_ref[0] + qi * block_q
    k_start = koff_ref[0] + kj * block_kv

    kv_padded = kv_len % block_kv != 0

    # Two-level kv tiling (see flash_fwd): DMA at block_kv, compute and
    # causal-skip at block_sub granularity. One scale per DMA block (the
    # quantization granularity) covers all of its subtiles.
    #
    # GQA (rep > 1): grid axis 0 is b·h_kv; the q block carries the kv
    # head's whole q group [rep, block_q, d] and every K/V subtile residency
    # serves all rep groups — the int8 K/V payloads AND their scale tables
    # exist once per kv head (rep x less quantize work + HBM traffic than
    # quantizing a repeated copy).
    q_bf = [q_ref[0, g].astype(jnp.bfloat16) for g in range(rep)]

    def _subtile(j):
        sub_start = k_start + j * block_sub
        sub_local = kj * block_kv + j * block_sub  # shard-local, for padding

        def _sub_body():
            # K/V are quantized at block_sub (compute-subtile) granularity so
            # the backward can tile independently of the (large, DMA-sized)
            # block_kv; the scale table is indexed by absolute subtile.
            sk = sk_ref[b, kj * (block_kv // block_sub) + j]
            sv = sv_ref[b, kj * (block_kv // block_sub) + j]

            k_sub = k_ref[0, pl.ds(j * block_sub, block_sub), :].astype(jnp.bfloat16)
            v_sub = v_ref[0, pl.ds(j * block_sub, block_sub), :].astype(jnp.bfloat16)
            if causal or kv_padded:
                mask = tile_mask(q_start, sub_start, block_q, block_sub,
                                 kv_len, causal, k_local_start=sub_local)

            for g in range(rep):
                sq = sq_ref[b, g, qi]
                # per-(q-block, k-block) dequant scale; c > 0, so masking and
                # the row max can run in the RAW int-product domain and the
                # scale folds into the exp2 operand chain (mul+sub+exp2 fuse
                # into one VPU pass) — the int8 kernel then runs the same
                # number of full-tile VPU passes as the bf16 kernel, where a
                # standalone `s = qk * c` dequant pass measurably lost the
                # race to it.
                c = sq * sk * qk_scale

                qk = jax.lax.dot_general(
                    q_bf[g], k_sub,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

                # masked logits underflow to 0 through exp2; junk rows
                # self-heal via alpha underflow (see flash_fwd), one
                # where-pass suffices. The raw-domain sentinel must be
                # SCALE-AWARE: a fixed raw value scaled by a tiny c
                # (small-magnitude Q/K blocks, e.g. early training) would not
                # underflow and masked positions would leak probability.
                # -MASK/c makes the scaled logit exactly -MASK for every
                # c > 0 (c >= ~1e-14 by the quantizer's 1e-12/127 scale
                # floor, so -MASK/c stays finite in f32).
                if causal or kv_padded:
                    qk = jnp.where(mask, qk, 30000.0 / -c)

                m_prev = m_scr[g][:, :1]
                # scaled row max via a cheap [bq,1] column op; EPS_BIAS keeps
                # the top bf16 P entry strictly below 1.0 (same rule as
                # flash_fwd).
                row_max = jnp.max(qk, axis=-1, keepdims=True) * c + EPS_BIAS
                next_m = jnp.maximum(m_prev, row_max)

                # P stays bf16 (module doc: no rate gain from int8 P on the
                # MXU); l sums the *rounded* P that enters the PV matmul so
                # the epilogue normalization matches the accumulated mass.
                p = jnp.exp2(qk * c - next_m).astype(jnp.bfloat16)

                alpha = jnp.exp2(m_prev - next_m)
                l_cur = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
                l_next = l_scr[g][:, :1] * alpha + l_cur

                pv = jax.lax.dot_general(
                    p, v_sub,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc_scr[g] = acc_scr[g] * alpha + pv * sv

                m_scr[g] = jnp.broadcast_to(next_m, m_scr.shape[1:])
                l_scr[g] = jnp.broadcast_to(l_next, l_scr.shape[1:])

        if causal:
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
            # tokens-on-lanes lse layout — see flash_fwd epilogue
            lse = m_scr[g][:, :1] + jnp.log2(l_safe)
            lse_ref[0, g] = jnp.broadcast_to(
                lse.reshape(1, -1), lse_ref.shape[2:]
            )


def _int8_fused_kernel(
    qoff_ref, koff_ref,
    q_ref, k_ref, v_ref, ksub_ref,
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    q_scr, sq_scr, k_scr, v_scr, sk_scr, sv_scr,
    *, qk_scale, causal, kv_len, num_kv_blocks, block_q, block_kv, block_sub,
    reuse_kv, smooth_k, rep,
):
    """Inference-mode int8 forward: quantization runs IN-KERNEL on the
    VMEM-resident tiles (the reference's own structure,
    attention_int8.py:180-195, 241-247) — no int8 payload or scale table
    ever materializes in HBM. The training path cannot do this (the
    backward's residual contract needs the HBM blocks); the serving /
    fwd-only path has no residuals, so the separate quantize pass's HBM
    round-trip (read f32 + write i8 + re-read i8) disappears entirely.

    reuse_kv=True (whole padded kv fits the VMEM scratch budget): each KV
    subtile is quantized exactly once — on the qi==0 visit — into a
    persistent scratch holding the integer payload in bf16 (exact: |x| <=
    127 fits bf16's 8-bit mantissa) with per-subtile scales in SMEM; later
    q-blocks reuse the scratch, so quantization work is O(t), not
    O(t * num_q_blocks), and K/V HBM reads happen once in ORIGINAL dtype.
    reuse_kv=False (very long sequences): quantize per (qi, kj) cell into a
    block-sized scratch — still zero HBM round-trips.

    The qi grid axis is declared "arbitrary" (sequential) when reuse_kv:
    the scratch carries state from qi==0 to later q-blocks.

    GQA (rep > 1): grid axis 0 is b·h_kv; the whole q group quantizes into a
    [rep, block_q, d] scratch with per-group scales, and every quantized K/V
    subtile serves all rep groups (quantize work per kv head, not q head).
    """
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(kj == 0)
    def _quant_q():
        # Q quantizes once per q-block (the tile stays resident across kj —
        # its block index is kj-invariant); integer payload stored as bf16,
        # ready for the MXU
        for g in range(rep):
            q_raw = q_ref[0, g].astype(jnp.float32)
            sq = jnp.maximum(jnp.max(jnp.abs(q_raw)), 1e-12) / 127.0
            q_scr[g] = jnp.clip(jnp.round(q_raw / sq), -127.0, 127.0).astype(
                jnp.bfloat16
            )
            sq_scr[g] = sq

    q_start = qoff_ref[0] + qi * block_q
    k_start = koff_ref[0] + kj * block_kv
    kv_padded = kv_len % block_kv != 0
    n_sub = block_kv // block_sub

    def _quant_kv(j):
        # scratch layout: reuse_kv indexes by the GLOBAL subtile, the
        # per-cell mode by the local one
        dst = (kj * block_kv + j * block_sub) if reuse_kv else (j * block_sub)
        row = (kj * n_sub + j) if reuse_kv else j
        k_raw = k_ref[0, pl.ds(j * block_sub, block_sub), :].astype(jnp.float32)
        if smooth_k:
            k_raw = k_raw - ksub_ref[0, 0].astype(jnp.float32)
        sk = jnp.maximum(jnp.max(jnp.abs(k_raw)), 1e-12) / 127.0
        k_scr[pl.ds(dst, block_sub), :] = jnp.clip(
            jnp.round(k_raw / sk), -127.0, 127.0
        ).astype(jnp.bfloat16)
        sk_scr[row] = sk
        v_raw = v_ref[0, pl.ds(j * block_sub, block_sub), :].astype(jnp.float32)
        sv = jnp.maximum(jnp.max(jnp.abs(v_raw)), 1e-12) / 127.0
        v_scr[pl.ds(dst, block_sub), :] = jnp.clip(
            jnp.round(v_raw / sv), -127.0, 127.0
        ).astype(jnp.bfloat16)
        sv_scr[row] = sv

    def _compute(j):
        sub_start = k_start + j * block_sub
        sub_local = kj * block_kv + j * block_sub

        def _sub_body():
            src = (kj * block_kv + j * block_sub) if reuse_kv else (j * block_sub)
            row = (kj * n_sub + j) if reuse_kv else j
            sk = sk_scr[row]
            sv = sv_scr[row]
            k_sub = k_scr[pl.ds(src, block_sub), :]
            v_sub = v_scr[pl.ds(src, block_sub), :]
            if causal or kv_padded:
                mask = tile_mask(q_start, sub_start, block_q, block_sub,
                                 kv_len, causal, k_local_start=sub_local)

            for g in range(rep):
                sq = sq_scr[g]
                c = sq * sk * qk_scale  # > 0 (1e-12/127 scale floor)

                qk = jax.lax.dot_general(
                    q_scr[g], k_sub,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                # raw-domain scale-aware mask sentinel — see _int8_fwd_kernel
                if causal or kv_padded:
                    qk = jnp.where(mask, qk, 30000.0 / -c)

                m_prev = m_scr[g][:, :1]
                row_max = jnp.max(qk, axis=-1, keepdims=True) * c + EPS_BIAS
                next_m = jnp.maximum(m_prev, row_max)
                p = jnp.exp2(qk * c - next_m).astype(jnp.bfloat16)
                alpha = jnp.exp2(m_prev - next_m)
                l_cur = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
                l_next = l_scr[g][:, :1] * alpha + l_cur
                pv = jax.lax.dot_general(
                    p, v_sub,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc_scr[g] = acc_scr[g] * alpha + pv * sv
                m_scr[g] = jnp.broadcast_to(next_m, m_scr.shape[1:])
                l_scr[g] = jnp.broadcast_to(l_next, l_scr.shape[1:])

        if causal:
            pl.when(q_start + block_q - 1 >= sub_start)(_sub_body)
        else:
            _sub_body()

    for j in range(n_sub):
        if reuse_kv:
            # quantize on the first q-block's visit only — even for
            # causally-skipped subtiles (later q-blocks will need them)
            pl.when(qi == 0)(functools.partial(_quant_kv, j))
        else:
            _quant_kv(j)
        _compute(j)

    @pl.when(kj == num_kv_blocks - 1)
    def _epilogue():
        for g in range(rep):
            l = l_scr[g][:, :1]
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, g] = (acc_scr[g] / l_safe).astype(o_ref.dtype)
            lse = m_scr[g][:, :1] + jnp.log2(l_safe)
            lse_ref[0, g] = jnp.broadcast_to(
                lse.reshape(1, -1), lse_ref.shape[2:]
            )


@functools.partial(
    jax.jit, static_argnames=("causal", "sm_scale", "config", "interpret")
)
def int8_attention_fwd_fused(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    sm_scale: float | None = None,
    config: BlockConfig | None = None,
    k_sub: jnp.ndarray | None = None,
    interpret: bool | None = None,
):
    """Inference-mode INT8 attention on [b, h, t, d]: quantization fused
    into the attention kernel itself (VMEM-resident tiles, zero HBM
    round-trip) — the forward-only counterpart of int8_attention_fwd,
    which must materialize residuals for the backward. Returns (o, lse).

    k_sub: optional [b, h, 1, d] K-smoothing shift (softmax is invariant to
    a per-row-constant shift of the logits, so no output compensation is
    needed — only quantization accuracy improves). Compute it as
    k.mean(axis=-2, keepdims=True) when K has a large common component.
    """
    if interpret is None:
        interpret = use_interpret_mode()
    batch, head, q_tokens, head_dim = q.shape
    kv_head, kv_len = k.shape[1], k.shape[2]
    if head % kv_head != 0:
        raise ValueError(f"q heads ({head}) must be a multiple of kv heads ({kv_head})")
    rep = head // kv_head
    if config is None:
        config = default_block_config("int8", q_tokens, kv_len, head_dim)
    config = config.clamp_rep(rep)
    block_q = config.block_q
    # The DMA block is capped at the quantization grain: the persistent
    # quantized scratch replaces the big-resident-tile trick (the f32 input
    # tiles at block_kv=4096+ double-buffered blow the 16 MB scoped-vmem
    # budget — measured OOM at (4,16,4096,64): 19.06M > 16M), and the
    # frozen index maps below stop re-DMA after qi==0 anyway. The grain
    # itself is unchanged, so outputs stay bit-identical to the
    # materialized forward.
    block_sub = min(config.kv_compute, config.block_kv)
    block_kv = min(config.block_kv, max(block_sub, 1024))
    _, qk_scale = qk_scales(head_dim, sm_scale)

    bh_kv = batch * kv_head
    q4 = pad_tokens(q.reshape(bh_kv, rep, q_tokens, head_dim), block_q, 2)
    k3 = pad_tokens(k.reshape(bh_kv, kv_len, head_dim), block_kv, 1)
    v3 = pad_tokens(v.reshape(bh_kv, kv_len, head_dim), block_kv, 1)
    padded_q, padded_kv = q4.shape[2], k3.shape[1]
    num_q_blocks = cdiv(padded_q, block_q)
    num_kv_blocks = cdiv(padded_kv, block_kv)

    # whole-kv scratch reuse when the bf16 payload copies fit a conservative
    # VMEM budget (the block tiles + accumulators share the same 16 MB)
    reuse_kv = num_q_blocks > 1 and (2 * padded_kv * head_dim * 2) <= 6 * 1024 * 1024
    scr_tokens = padded_kv if reuse_kv else block_kv
    n_scales = scr_tokens // block_sub

    smooth_k = k_sub is not None
    if smooth_k:
        ksub3 = k_sub.reshape(bh_kv, 1, head_dim)
    else:
        ksub3 = jnp.zeros((bh_kv, 1, head_dim), k3.dtype)

    kernel = functools.partial(
        _int8_fused_kernel,
        qk_scale=qk_scale,
        causal=causal,
        kv_len=kv_len,
        num_kv_blocks=num_kv_blocks,
        block_q=block_q,
        block_kv=block_kv,
        block_sub=block_sub,
        reuse_kv=reuse_kv,
        smooth_k=smooth_k,
        rep=rep,
    )

    qoff = jnp.zeros((1,), jnp.int32)
    koff = jnp.zeros((1,), jnp.int32)

    if reuse_kv:
        # after qi==0 has quantized everything into scratch, K/V tiles are
        # never read again — freeze their block index so the pipeline stops
        # DMAing them (one redundant block-0 fetch per q-block remains)
        def kv_map(b, i, j):
            return (b, jnp.where(i == 0, j, 0), 0)
    else:
        def kv_map(b, i, j):
            return (b, j, 0)

    o, lse = pl.pallas_call(
        kernel,
        grid=(bh_kv, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rep, block_q, head_dim), lambda b, i, j: (b, 0, i, 0)),
            pl.BlockSpec((1, block_kv, head_dim), kv_map),
            pl.BlockSpec((1, block_kv, head_dim), kv_map),
            pl.BlockSpec((1, 1, head_dim), lambda b, i, j: (b, 0, 0)),
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
            pltpu.VMEM((rep, block_q, head_dim), jnp.bfloat16),
            pltpu.SMEM((rep,), jnp.float32),
            pltpu.VMEM((scr_tokens, head_dim), jnp.bfloat16),
            pltpu.VMEM((scr_tokens, head_dim), jnp.bfloat16),
            pltpu.SMEM((n_scales,), jnp.float32),
            pltpu.SMEM((n_scales,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # qi must run sequentially under reuse_kv (scratch carries the
            # quantized payload from qi==0 to later q-blocks)
            dimension_semantics=(
                "parallel",
                "arbitrary" if reuse_kv else "parallel",
                "arbitrary",
            ),
        ),
        interpret=interpret,
    )(qoff, koff, q4, k3, v3, ksub3)

    o = o[:, :, :q_tokens].reshape(batch, head, q_tokens, head_dim)
    lse = lse[:, :, 0, :q_tokens].reshape(batch, head, q_tokens)
    return o, lse


def quantize_qkv(q, k, v, config: BlockConfig, k_sub=None, interpret: bool | None = None):
    """Per-block int8 quantization of Q/K/V at the kernel's block granularity,
    each tensor in ONE fused Pallas pass (read -> absmax/scale/round in VMEM
    -> quarter-width write; the reference quantizes in-kernel for the same
    no-extra-round-trip reason, attention_int8.py:180-195).

    k_sub: optional [b, h, 1, d] shift (K-smoothing mean) subtracted from K
    inside the quantization kernel — the smoothed K never materializes in f32.

    Returns ((q_i8, sq), (k_i8, sk), (v_i8, sv)) on [b·h, padded_t, d] /
    [b·h, n_blocks] layouts — the residual set the backward reuses.
    """
    if interpret is None:
        interpret = use_interpret_mode()
    batch, head, q_tokens, head_dim = q.shape
    kv_len = k.shape[2]
    bh = batch * head
    bh_kv = batch * k.shape[1]  # may be < bh under GQA (unrepeated kv heads)
    # same rep clamp every consumer of these residuals applies — the q grain
    # here IS the scale-table tiling the fwd kernel and backward index by
    config = config.clamp_rep(head // k.shape[1])
    # K/V quantize at the compute-subtile grain (<= block_kv), q at block_q:
    # the forward DMAs at block_kv but applies one scale per subtile, and the
    # backward tiles at exactly the quantization grain (see int8_bwd).
    q3 = pad_tokens(q.reshape(bh, q_tokens, head_dim), config.block_q, 1)
    k3 = pad_tokens(k.reshape(bh_kv, kv_len, head_dim), config.block_kv, 1)
    v3 = pad_tokens(v.reshape(bh_kv, kv_len, head_dim), config.block_kv, 1)
    kv_grain = min(config.kv_compute, k3.shape[1])
    sub3 = None if k_sub is None else k_sub.reshape(bh_kv, 1, head_dim)
    if q3.shape == k3.shape and config.block_q == kv_grain:
        # square fast path: one dispatch for all three tensors
        if sub3 is None:
            sub3 = jnp.zeros((bh, 1, head_dim), q3.dtype)
        return quantize_qkv_one_pass(q3, k3, v3, sub3, config.block_q,
                                     interpret=interpret)
    q_i8, sq = quantize_int8_blocks_fused(q3, config.block_q, interpret=interpret)
    k_i8, sk = quantize_int8_blocks_fused(k3, kv_grain, sub=sub3, interpret=interpret)
    v_i8, sv = quantize_int8_blocks_fused(v3, kv_grain, interpret=interpret)
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
    k_sub: jnp.ndarray | None = None,
    interpret: bool | None = None,
):
    """INT8 attention forward on [b, h, t, d] inputs.

    k_sub: optional [b, h, 1, d] K-smoothing mean, fused into the K
    quantization pass (pass it instead of pre-smoothing K when the shift is
    already known). If omitted, K is quantized as given.

    Returns (o, lse, residuals) where residuals =
    ((q_i8, sq), (k_i8, sk), (v_i8, sv)) for the int8 backward.
    """
    if interpret is None:
        interpret = use_interpret_mode()
    batch, head, q_tokens, head_dim = q.shape
    kv_len = k.shape[2]
    if config is None:
        config = default_block_config("int8", q_tokens, kv_len, head_dim)
    config = config.clamp_rep(head // k.shape[1])
    residuals = quantize_qkv(q, k, v, config, k_sub=k_sub)
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
    q_offset: jnp.ndarray | int = 0,
    k_offset: jnp.ndarray | int = 0,
):
    """Run the int8 forward from pre-quantized blocks (KV-cache reuse path).

    GQA: when k_i8/sk carry fewer (b·h_kv) rows than q_i8/sq (b·h), the q
    group of each kv head folds into the grid cell — unrepeated int8 K/V
    payloads and scales stream once per kv head.

    q_offset/k_offset: global token positions of the local q / kv shards
    (causal masking across sequence shards, as in flash_fwd)."""
    if interpret is None:
        interpret = use_interpret_mode()
    (q_i8, sq), (k_i8, sk), (v_i8, sv) = residuals
    batch, head, q_tokens, kv_len, head_dim = dims
    if config is None:
        config = default_block_config("int8", q_tokens, kv_len, head_dim)
    bh = batch * head
    bh_kv = k_i8.shape[0]
    if bh % bh_kv != 0:
        raise ValueError(f"q rows ({bh}) must be a multiple of kv rows ({bh_kv})")
    rep = bh // bh_kv
    # same deterministic clamp the quantization pass applied — keeps the
    # kernel tiling aligned with the residuals' scale-table grain
    config = config.clamp_rep(rep)
    block_q, block_kv = config.block_q, config.block_kv
    _, qk_scale = qk_scales(head_dim, sm_scale)

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
        rep=rep,
    )

    q_i8_4 = q_i8.reshape(bh_kv, rep, padded_q, head_dim)
    sq_f32 = sq.astype(jnp.float32).reshape(bh_kv, rep, -1)
    sk_f32 = sk.astype(jnp.float32)
    sv_f32 = sv.astype(jnp.float32)
    qoff = jnp.asarray(q_offset, jnp.int32).reshape(1)
    koff = jnp.asarray(k_offset, jnp.int32).reshape(1)

    o, lse = pl.pallas_call(
        kernel,
        grid=(bh_kv, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rep, block_q, head_dim), lambda b, i, j: (b, 0, i, 0)),
            pl.BlockSpec((1, block_kv, head_dim), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_kv, head_dim), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
    )(qoff, koff, q_i8_4, k_i8, v_i8, sq_f32, sk_f32, sv_f32)

    o = o[:, :, :q_tokens].reshape(batch, head, q_tokens, head_dim)
    lse = lse[:, :, 0, :q_tokens].reshape(batch, head, q_tokens)
    return o, lse
