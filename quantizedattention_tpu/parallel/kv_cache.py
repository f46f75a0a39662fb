"""INT8-quantized KV cache + Pallas decode attention (serving path).

New capability vs the reference (no serving/inference layer exists there;
the north-star BASELINE.json demands a quantized KV-cache inference path).

Design: the cache stores int8 K/V payloads with *per-token* symmetric scales
(append-friendly — adding a token never re-scales old blocks). Decode is
bandwidth-bound, so the win of int8 here is halved HBM traffic: the kernel
dequantizes tiles in VMEM right before the matmuls (the same
load-then-dequantize structure as JAX's quantized paged attention). Scales
are stored [b, h, max_len] — token axis LAST — because inside the kernel
the token axis of S and P lies on the 128-lane dimension: the K scale
applies as `s * sk[:, None, :]` and the V scale folds into P before the PV
dot, so scales never touch the [*, 1]-shaped layout that TPU tiling would
pad to 128 lanes (a [h, block, 1] f32 scale tile costs 128x its data).

GQA layout: q heads are grouped onto their KV head — [b, n_kv, group, d].
The grid is (batch, kv_blocks) with ALL of a sequence's KV heads processed
in-cell via batched dots (per-head grid cells are tiny at decode shapes and
launch overhead dominated); head sharding still needs zero cross-chip
traffic because the head axis is a batch axis of every dot
(see serve/engine.py's sharded decode).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantizedattention_tpu.ops.common import qk_scales
from quantizedattention_tpu.utils.runtime import cdiv, use_interpret_mode

_LANES = 128


class QuantizedKVCache(NamedTuple):
    """int8 KV cache: payload [b, h_kv, max_len, d], scales [b, h_kv, max_len]."""

    k_i8: jnp.ndarray
    sk: jnp.ndarray
    v_i8: jnp.ndarray
    sv: jnp.ndarray
    length: jnp.ndarray  # [b] int32, tokens filled per batch row

    @property
    def max_len(self) -> int:
        return self.k_i8.shape[2]


def init_kv_cache(batch: int, n_kv_heads: int, max_len: int, head_dim: int) -> QuantizedKVCache:
    if max_len % _LANES != 0:
        raise ValueError(f"max_len={max_len} must be a multiple of {_LANES} (TPU lane tiling)")
    return QuantizedKVCache(
        k_i8=jnp.zeros((batch, n_kv_heads, max_len, head_dim), jnp.int8),
        sk=jnp.zeros((batch, n_kv_heads, max_len), jnp.float32),
        v_i8=jnp.zeros((batch, n_kv_heads, max_len, head_dim), jnp.int8),
        sv=jnp.zeros((batch, n_kv_heads, max_len), jnp.float32),
        length=jnp.zeros((batch,), jnp.int32),
    )


def _row_quant(x):
    """Per-token symmetric int8: returns (x_i8 [..., t, d], scales [..., t])."""
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-12) / 127.0
    x_i8 = jnp.clip(jnp.round(x / s), -127.0, 127.0).astype(jnp.int8)
    return x_i8, s[..., 0].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=())
def append_kv(
    cache: QuantizedKVCache,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    active: jnp.ndarray | None = None,
) -> QuantizedKVCache:
    """Quantize and append [b, h_kv, t_new, d] keys/values at each row's length.

    active: optional [b] bool — rows where it is False do not advance
    `length` (continuous batching: idle slots ride along in the batched
    decode step without corrupting their cache; their masked write lands at
    the stale `length` position, which is past the row's logical end and
    invisible to the length-masked decode kernel).
    """
    k_i8, sk = _row_quant(k_new.astype(jnp.float32))
    v_i8, sv = _row_quant(v_new.astype(jnp.float32))

    def upd(buf, val, pos):
        # buf [h, max_len(, d)], val [h, t_new(, d)] — one batch row
        return jax.lax.dynamic_update_slice(buf, val, (0, pos) + (0,) * (buf.ndim - 2))

    t_new = k_new.shape[2]
    adv = t_new if active is None else t_new * active.astype(jnp.int32)
    return QuantizedKVCache(
        k_i8=jax.vmap(upd)(cache.k_i8, k_i8, cache.length),
        sk=jax.vmap(upd)(cache.sk, sk, cache.length),
        v_i8=jax.vmap(upd)(cache.v_i8, v_i8, cache.length),
        sv=jax.vmap(upd)(cache.sv, sv, cache.length),
        length=cache.length + adv,
    )


def write_kv_slot(
    cache: QuantizedKVCache,
    slot: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    true_len: jnp.ndarray,
) -> QuantizedKVCache:
    """Fused-prefill write: quantize [h_kv, t, d] K/V and install them at
    batch row `slot`, resetting the row's length to `true_len` (<= t; the
    tail beyond true_len is prompt padding, masked out by the decode kernel).
    """
    k_i8, sk = _row_quant(k_new.astype(jnp.float32))
    v_i8, sv = _row_quant(v_new.astype(jnp.float32))

    def put(buf, val):
        return jax.lax.dynamic_update_slice(
            buf, val[None], (slot,) + (0,) * (buf.ndim - 1)
        )

    # pad/trim the time axis to the cache's max_len before installing
    def fit(val):
        t = val.shape[1]
        if t < cache.max_len:
            widths = [(0, 0), (0, cache.max_len - t)] + [(0, 0)] * (val.ndim - 2)
            val = jnp.pad(val, widths)
        return val[:, : cache.max_len]

    return QuantizedKVCache(
        k_i8=put(cache.k_i8, fit(k_i8)),
        sk=put(cache.sk, fit(sk)),
        v_i8=put(cache.v_i8, fit(v_i8)),
        sv=put(cache.sv, fit(sv)),
        length=cache.length.at[slot].set(true_len.astype(jnp.int32)),
    )


def write_kv_chunk(
    cache: QuantizedKVCache,
    slot: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    start,
    new_len: jnp.ndarray,
) -> QuantizedKVCache:
    """Chunked-prefill write: quantize [h_kv, c, d] K/V and install them at
    (row `slot`, position `start`), setting the row length to `new_len`
    (chunked prefill appends prompt chunks left to right; the serving engine
    interleaves decode steps of OTHER slots between chunks)."""
    k_i8, sk = _row_quant(k_new.astype(jnp.float32))
    v_i8, sv = _row_quant(v_new.astype(jnp.float32))
    start = jnp.asarray(start, jnp.int32)

    def put(buf, val):
        idx = (slot, jnp.int32(0), start) + (jnp.int32(0),) * (buf.ndim - 3)
        return jax.lax.dynamic_update_slice(buf, val[None], idx)

    return QuantizedKVCache(
        k_i8=put(cache.k_i8, k_i8),
        sk=put(cache.sk, sk),
        v_i8=put(cache.v_i8, v_i8),
        sv=put(cache.sv, sv),
        length=cache.length.at[slot].set(new_len.astype(jnp.int32)),
    )


def _decode_kernel(
    len_ref,  # SMEM [batch] int32
    q_ref, k_ref, sk_ref, v_ref, sv_ref,
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, qk_scale, block_kv, num_kv_blocks, spec=1,
):
    """Grid (batch, kv_blocks); ALL kv heads of one sequence per cell.

    Keeping the head axis inside the kernel (batched dot_general over it)
    instead of in the grid matters at decode shapes: per-head cells are tiny
    ([group, d] x [d, block]) and per-cell launch overhead dominated the
    kernel — measured ~2x faster at (8 slots, 16 heads, ctx 1024) with
    heads in-cell (0.13 vs 0.27 ms fetch-bias-corrected on v5e).
    """
    b = pl.program_id(0)
    kj = pl.program_id(1)

    @pl.when(kj == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = len_ref[b]
    k_start = kj * block_kv

    @pl.when(k_start < length)
    def _body():
        # int8 payloads are EXACT in bf16 (integers <= 127 fit an 8-bit
        # mantissa), so the dots run at bf16 MXU rate with f32 accumulation;
        # only q / p round to bf16 — the same rounding the training kernel's
        # P takes. HIGHEST-precision f32 here cost 6 MXU passes for zero
        # extra information on the K/V side.
        q = q_ref[0].astype(jnp.bfloat16)     # [h, group, d]
        k_f = k_ref[0].astype(jnp.bfloat16)   # [h, block_kv, d] (unscaled)
        sk = sk_ref[0]                        # [h, block_kv] — lane-aligned

        # Per-token K scales apply on the LANE axis of S (not on K itself):
        # s[h,g,t] = (q·k_i8ᵀ)[t] · sk[t] · qk_scale. This keeps scale tiles
        # [h, block] instead of [h, block, 1] (which TPU tiling pads 128x).
        s = jax.lax.dot_general(
            q, k_f, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (sk[:, None, :] * qk_scale)  # [h, group, block_kv]

        cols = k_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        if spec == 1:
            mask = cols < length
        else:
            # Speculative verify: the q-row axis folds `spec` consecutive
            # positions per GQA group (row r = g*spec + j). The j-th query
            # is the token at position length - spec + j, so it may attend
            # keys at cols <= length - spec + j (itself included).
            row_j = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) % spec
            mask = cols < length - (spec - 1) + row_j
        s = jnp.where(mask, s, -jnp.inf)

        m_prev = m_scr[...][:, :, :1]
        next_m = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(mask, jnp.exp2(s - next_m), 0.0)
        alpha = jnp.exp2(m_prev - next_m)
        l_next = l_scr[...][:, :, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # V scales fold into P along its lane (token) axis before the dot:
        # Σ_t p[t]·sv[t]·v_i8[t,d] == Σ_t p[t]·v_f[t,d]
        pv = jax.lax.dot_general(
            (p * sv_ref[0][:, None, :]).astype(jnp.bfloat16),
            v_ref[0].astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha + pv
        m_scr[...] = jnp.broadcast_to(next_m, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

    @pl.when(kj == num_kv_blocks - 1)
    def _epilogue():
        l = l_scr[...][:, :, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
        # exp2-domain lse of the local partial; -inf when this shard holds
        # no live tokens for the row (the cross-shard merge weights it 0)
        m = m_scr[...][:, :, :1]
        lse = jnp.where(l == 0.0, -jnp.inf, m + jnp.log2(l_safe))
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def decode_attention(
    q: jnp.ndarray,
    cache: QuantizedKVCache,
    sm_scale: float | None = None,
    block_kv: int | None = None,
    return_lse: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Single-token decode: q [b, n_q_heads, d] against the int8 cache.

    Supports GQA (n_q_heads a multiple of the cache's n_kv_heads). Returns
    [b, n_q_heads, d] f32; with return_lse=True also the exp2-domain lse
    [b, n_q_heads] (-inf for rows with no live tokens) — the merge handle
    for sequence-sharded decode (context_sharded_decode).

    block_kv=None (the default — what the serving engine passes) consults
    the autotune cache for a tuned decode block on this device kind
    (tune.autotune.autotune_decode / resolve_decode_block), so the
    tune-then-pin workflow reaches the serving hot path with zero caller
    changes. Resolution happens at trace time; tune before first call.
    """
    if block_kv is None:
        from quantizedattention_tpu.tune.autotune import resolve_decode_block

        block_kv = resolve_decode_block(cache.max_len, q.shape[-1])
    return _decode_attention(q, cache, sm_scale, block_kv, return_lse, interpret)


def verify_decode_attention(
    q: jnp.ndarray,
    cache: QuantizedKVCache,
    sm_scale: float | None = None,
    block_kv: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Multi-position decode for speculative verification: q [b, H, s, d]
    holds s consecutive query positions per slot (the last accepted token
    followed by s-1 draft tokens), whose K/V must ALREADY be appended to
    the cache (row length includes all s). Query j sits at position
    length - s + j and attends keys at cols <= length - s + j — a causal
    staircase the kernel applies per folded q-row, so one dispatch verifies
    s positions instead of s dispatches (serve/spec.py).

    Returns [b, H, s, d] f32.
    """
    b, n_q_heads, s, d = q.shape
    n_kv = cache.k_i8.shape[1]
    if n_q_heads % n_kv != 0:
        raise ValueError(f"{n_q_heads} q heads not a multiple of {n_kv} kv heads")
    group = n_q_heads // n_kv
    if block_kv is None:
        from quantizedattention_tpu.tune.autotune import resolve_decode_block

        block_kv = resolve_decode_block(cache.max_len, d)
    # fold (group, spec) into the q-row axis: row r = g*s + j
    qf = q.reshape(b, n_kv, group, s, d).reshape(b, n_kv * group * s, d)
    o = _decode_attention(qf, cache, sm_scale, block_kv, False, interpret, spec=s)
    return o.reshape(b, n_kv, group, s, d).reshape(b, n_q_heads, s, d)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "block_kv", "return_lse", "interpret", "spec")
)
def _decode_attention(
    q: jnp.ndarray,
    cache: QuantizedKVCache,
    sm_scale: float | None = None,
    block_kv: int = 1024,
    return_lse: bool = False,
    interpret: bool | None = None,
    spec: int = 1,
) -> jnp.ndarray:
    if interpret is None:
        interpret = use_interpret_mode()
    batch, n_q_heads, head_dim = q.shape
    n_kv = cache.k_i8.shape[1]
    if n_q_heads % n_kv != 0:
        raise ValueError(f"{n_q_heads} q heads not a multiple of {n_kv} kv heads")
    group = n_q_heads // n_kv
    # pad the GQA group to the f32 sublane minimum
    group_pad = max(8, ((group + 7) // 8) * 8)
    max_len = cache.max_len
    # block_kv rides the LANE axis of the scale tiles -> 128-multiple only;
    # cap it so the per-cell f32 K/V tiles (the VMEM heavyweight:
    # n_kv * block_kv * d * 8 bytes) stay within budget
    vmem_budget = 8 * 1024 * 1024
    cap = max(_LANES, vmem_budget // (n_kv * head_dim * 8))
    block_kv = max(_LANES, (min(block_kv, cap) // _LANES) * _LANES)
    if max_len % block_kv != 0:
        # largest 128-multiple divisor of max_len not above the request
        start = (min(block_kv, max_len) // _LANES) * _LANES
        block_kv = next(
            (b for b in range(start, 127, -_LANES) if max_len % b == 0), 0
        )
        if not block_kv:
            raise ValueError(f"max_len={max_len} has no 128-multiple block divisor")

    _, qk_scale = qk_scales(head_dim, sm_scale)

    qg = q.astype(jnp.float32).reshape(batch, n_kv, group, head_dim)
    qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_pad - group), (0, 0)))

    num_kv_blocks = cdiv(max_len, block_kv)

    kernel = functools.partial(
        _decode_kernel,
        qk_scale=qk_scale,
        block_kv=block_kv,
        num_kv_blocks=num_kv_blocks,
        spec=spec,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, n_kv, group_pad, head_dim), lambda b, j, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, n_kv, block_kv, head_dim), lambda b, j, *_: (b, 0, j, 0)),
            pl.BlockSpec((1, n_kv, block_kv), lambda b, j, *_: (b, 0, j)),
            pl.BlockSpec((1, n_kv, block_kv, head_dim), lambda b, j, *_: (b, 0, j, 0)),
            pl.BlockSpec((1, n_kv, block_kv), lambda b, j, *_: (b, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, n_kv, group_pad, head_dim), lambda b, j, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, n_kv, group_pad, _LANES), lambda b, j, *_: (b, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_kv, group_pad, _LANES), jnp.float32),
            pltpu.VMEM((n_kv, group_pad, _LANES), jnp.float32),
            pltpu.VMEM((n_kv, group_pad, head_dim), jnp.float32),
        ],
    )

    o, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, n_kv, group_pad, head_dim), jnp.float32),
            jax.ShapeDtypeStruct((batch, n_kv, group_pad, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(cache.length, qg, cache.k_i8, cache.sk, cache.v_i8, cache.sv)

    o = o[:, :, :group].reshape(batch, n_q_heads, head_dim)
    if not return_lse:
        return o
    lse = lse[:, :, :group, 0]
    return o, lse.reshape(batch, n_q_heads)


def shard_cache_context(cache: QuantizedKVCache, axis_name: str) -> QuantizedKVCache:
    """View a device's sequence shard of a context-sharded cache: the shard
    holds global token positions [idx*shard_len, (idx+1)*shard_len) and its
    local live-token count is the clipped remainder of the global length.
    Call inside shard_map on per-device values whose sequence axis is
    already the local shard."""
    idx = jax.lax.axis_index(axis_name)
    shard_len = cache.k_i8.shape[2]
    local_len = jnp.clip(cache.length - idx * shard_len, 0, shard_len)
    return cache._replace(length=local_len)


def context_sharded_decode(
    q: jnp.ndarray,
    cache: QuantizedKVCache,
    axis_name: str,
    sm_scale: float | None = None,
    block_kv: int | None = None,
) -> jnp.ndarray:
    """Flash-decoding over a sequence-sharded KV cache — call inside
    shard_map.

    The cache's token axis is sharded on `axis_name` (each chip holds a
    contiguous slice of every sequence; `cache.length` is the GLOBAL length,
    replicated). Each chip decodes against its own slice — half the HBM
    traffic of bf16 thanks to the int8 payload, zero KV movement — and the
    normalized partials merge with three tiny collectives over the
    [b, n_q_heads] statistics:
        m  = pmax(lse);  w = exp2(lse − m);  O = psum(w·O) / psum(w).
    This is the decode-side counterpart of ring attention's training-side
    merge (parallel/ring.py), per the north-star's "KV tensor-sharding over
    a multi-host pod slice with quantized KV-cache".
    """
    from quantizedattention_tpu.parallel.collective import lse_weighted_merge

    local = shard_cache_context(cache, axis_name)
    o, lse = decode_attention(
        q, local, sm_scale=sm_scale, block_kv=block_kv, return_lse=True
    )
    return lse_weighted_merge(o, lse, axis_name)
