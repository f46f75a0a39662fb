"""Can int8-DIRECT MXU dots lift the decode kernel's per-element floor?

Round-5 slope-timed data (experiments/kv4_ab.py): the int8 decode kernel
runs at 373-440 GB/s effective — ~50% of v5e HBM peak — because every K/V
element passes through the VPU for the int8->bf16 cast before the
bf16-rate dot. If Mosaic feeds int8 operands to the MXU natively
(dot int8 x int8 -> int32), that per-element cast vanishes and the kernel
should approach the DMA floor.

Numerics: q quantized per row (absmax/127) outside the kernel; S gets
sq*sk*qk_scale applied in f32 after the int32 dot. For PV, (p * sv) is
quantized per row to int8 in-kernel (SageAttention-style P quantization —
the accuracy cost the TRAINING kernels refuse; decode tolerance is looser)
and the int32 dot is rescaled by sp. Accuracy checked vs the f32 oracle
on the dequantized cache view.

Prototype kernel only — promoted to parallel/kv_cache.py if it wins.
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantizedattention_tpu.ops.common import qk_scales
from quantizedattention_tpu.parallel.kv_cache import (
    append_kv, decode_attention, init_kv_cache,
)
from quantizedattention_tpu.utils.profiling import chained_slope_seconds
from quantizedattention_tpu.utils.runtime import cdiv

_LANES = 128
B, H, D = 8, 16, 64


def _decode_kernel_i8(
    len_ref,
    q_ref, sq_ref, k_ref, sk_ref, v_ref, sv_ref,
    o_ref,
    m_scr, l_scr, acc_scr,
    *, qk_scale, block_kv, num_kv_blocks,
):
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
        q = q_ref[0]            # [h, group, d] int8
        sq = sq_ref[0]          # [h, group] f32 (on lanes? see spec below)
        sk = sk_ref[0]          # [h, block_kv]

        s_i32 = jax.lax.dot_general(
            q, k_ref[0], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )                       # [h, group, block_kv]
        s = s_i32.astype(jnp.float32) * (
            sq[:, :, None] * (sk[:, None, :] * qk_scale))

        cols = k_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        mask = cols < length
        s = jnp.where(mask, s, -jnp.inf)

        m_prev = m_scr[...][:, :, :1]
        next_m = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(mask, jnp.exp2(s - next_m), 0.0)
        alpha = jnp.exp2(m_prev - next_m)
        l_next = l_scr[...][:, :, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # quantize (p * sv) per q row to int8 (absmax/127)
        pe = p * sv_ref[0][:, None, :]
        sp = jnp.maximum(jnp.max(jnp.abs(pe), axis=-1, keepdims=True), 1e-30) / 127.0
        p_i8 = jnp.clip(jnp.round(pe / sp), -127.0, 127.0).astype(jnp.int8)
        pv = jax.lax.dot_general(
            p_i8, v_ref[0],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * sp
        acc_scr[...] = acc_scr[...] * alpha + pv
        m_scr[...] = jnp.broadcast_to(next_m, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

    @pl.when(kj == num_kv_blocks - 1)
    def _epilogue():
        l = l_scr[...][:, :, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_kv",))
def decode_attention_i8dot(q, cache, block_kv=1024):
    batch, n_heads, head_dim = q.shape
    n_kv = cache.k_i8.shape[1]
    group = n_heads // n_kv
    group_pad = max(8, ((group + 7) // 8) * 8)
    max_len = cache.max_len
    if max_len % block_kv != 0:
        block_kv = next(
            b for b in range(min(block_kv, max_len), 127, -_LANES)
            if max_len % b == 0
        )
    _, qk_scale = qk_scales(head_dim, None)

    qg = q.astype(jnp.float32).reshape(batch, n_kv, group, head_dim)
    qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_pad - group), (0, 0)))
    sq = jnp.maximum(jnp.max(jnp.abs(qg), axis=-1), 1e-30) / 127.0
    q_i8 = jnp.clip(jnp.round(qg / sq[..., None]), -127, 127).astype(jnp.int8)

    num_kv_blocks = cdiv(max_len, block_kv)
    kernel = functools.partial(
        _decode_kernel_i8, qk_scale=qk_scale, block_kv=block_kv,
        num_kv_blocks=num_kv_blocks,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, n_kv, group_pad, head_dim), lambda b, j, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, n_kv, group_pad), lambda b, j, *_: (b, 0, 0)),
            pl.BlockSpec((1, n_kv, block_kv, head_dim), lambda b, j, *_: (b, 0, j, 0)),
            pl.BlockSpec((1, n_kv, block_kv), lambda b, j, *_: (b, 0, j)),
            pl.BlockSpec((1, n_kv, block_kv, head_dim), lambda b, j, *_: (b, 0, j, 0)),
            pl.BlockSpec((1, n_kv, block_kv), lambda b, j, *_: (b, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, n_kv, group_pad, head_dim), lambda b, j, *_: (b, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_kv, group_pad, _LANES), jnp.float32),
            pltpu.VMEM((n_kv, group_pad, _LANES), jnp.float32),
            pltpu.VMEM((n_kv, group_pad, head_dim), jnp.float32),
        ],
    )
    (o,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, n_kv, group_pad, head_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=False,
    )(cache.length, q_i8, sq, cache.k_i8, cache.sk, cache.v_i8, cache.sv)
    return o[:, :, :group].reshape(batch, n_heads, head_dim)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    for ctx in [int(a) for a in sys.argv[1:]] or [1024, 4096, 8192]:
        max_len = ((ctx // 256) + 1) * 256
        k = jax.random.normal(jax.random.key(0), (B, H, ctx, D), jnp.float32)
        v = jax.random.normal(jax.random.key(1), (B, H, ctx, D), jnp.float32)
        c8 = init_kv_cache(B, H, max_len, D)
        c8 = append_kv(c8, k, v)
        q = jax.random.normal(jax.random.key(2), (B, H, D), jnp.float32)
        kv_bytes = 2 * B * H * max_len * D

        # accuracy vs the existing (bf16-dot) kernel
        try:
            o_new = decode_attention_i8dot(q, c8)
        except Exception as e:  # noqa: BLE001
            print(f"ctx {ctx}: i8dot FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        o_ref = decode_attention(q, c8, block_kv=1024)
        err = float(jnp.max(jnp.abs(o_new - o_ref)))
        t_ref = chained_slope_seconds(
            lambda qq, c: decode_attention(qq, c, block_kv=1024), q, c8)
        t_new = chained_slope_seconds(
            lambda qq, c: decode_attention_i8dot(qq, c), q, c8)
        print(f"ctx {ctx}: bf16-dot {t_ref*1e6:7.1f} us ({kv_bytes/t_ref/1e9:5.1f} GB/s)  "
              f"i8-dot {t_new*1e6:7.1f} us ({kv_bytes/t_new/1e9:5.1f} GB/s)  "
              f"speedup {t_ref/t_new:.3f}x  max|dO| {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
