"""Weight-only int4 matmul kernel: bf16 activations x packed-nibble weights.

The next rung below ops/int8_linear.py on the serving ladder (no reference
counterpart — the reference quantizes attention operands to int8 only,
attention_int8.py:180-195): decode at serving batch is WEIGHT-bandwidth-
bound, so int4 weights stream one QUARTER the bf16 bytes. v5e's MXU has no
low-precision rate advantage (docs/ARCHITECTURE.md §4), so as with int8 the
win is purely HBM traffic: nibbles are unpacked and dequantized on the
VMEM-resident tile and every dot runs at the ordinary bf16 rate.

Format (see quantize/weights.py:QuantizedWeight4):
- SPLIT-HALF packing. For a [K, n] weight (K padded to a multiple of
  2*group), byte [r, c] of the packed [K/2, n] int8 array holds row r of
  the LOWER half in its low nibble and row r + K/2 of the UPPER half in
  its high nibble. Unpacking is two shifts per byte and the two halves are
  consumed by two separate dots — no in-VMEM interleave or concat, which
  Mosaic would have to shuffle across sublanes.
- GROUP-WISE scales: one f32 scale per (group of `group` k-rows, output
  column), shape [K/group, n]. A group never crosses the half boundary
  (2*group | K), so each half's sub-dot uses exactly one scale row, and
  `(x_g @ w_g) * s_row == x_g @ (w_g * s_row)` factors the scale out of
  the MXU dot into one VPU multiply per group.

Grid is (m blocks, n blocks) with the FULL contraction in one kernel body
(model dims are a few thousand at most: the packed full-K tile tops out
around 2 MB of VMEM at K=8192) — each group is a static sub-slice, so the
scale tile needs no k-indexed BlockSpec and Mosaic sees only full or
(8,128)-aligned blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantizedattention_tpu.utils.runtime import cdiv, use_interpret_mode


def pack_int4(w4: jnp.ndarray) -> jnp.ndarray:
    """[K, n] int4-valued int8 (each in [-8, 7]) -> [K/2, n] packed bytes.

    Split-half: byte r = (w4[r] & 0xF) | (w4[r + K/2] << 4). K must be even.
    """
    k = w4.shape[0]
    if k % 2 != 0:
        raise ValueError(f"pack_int4 wants an even K, got {k}")
    lo = w4[: k // 2].astype(jnp.int32) & 0xF
    hi = w4[k // 2 :].astype(jnp.int32) & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray):
    """[K/2, n] packed bytes -> (lo, hi) int32 halves, sign-extended."""
    p = packed.astype(jnp.int32)
    lo = (p << 28) >> 28  # bits 0-3, sign-extended
    hi = (p << 24) >> 28  # bits 4-7, sign-extended
    return lo, hi


def _kernel(x_lo_ref, x_hi_ref, p_ref, s_lo_ref, s_hi_ref, o_ref, *,
            group: int, out_dtype):
    n_groups = p_ref.shape[0] // group
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for t in range(n_groups):
        rows = slice(t * group, (t + 1) * group)
        # Unpack PER GROUP, not the whole tile: byte rows [t*g, (t+1)*g)
        # carry lo-half group t in their low nibbles and hi-half group t in
        # their high nibbles, so each iteration touches one [group, block_n]
        # int32 temporary (~256 KB) instead of two full-K ones (2 x 8 MB at
        # K=8192 — over the 16 MB scoped-VMEM budget if Mosaic didn't sink
        # the shifts). int4 -> bf16 happens on the VMEM tile: HBM saw
        # nibble bytes. Group scale factors out of the dot.
        lo, hi = unpack_int4(p_ref[rows, :])
        acc += jax.lax.dot(
            x_lo_ref[:, rows], lo.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) * s_lo_ref[0, t : t + 1, :]
        acc += jax.lax.dot(
            x_hi_ref[:, rows], hi.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) * s_hi_ref[0, t : t + 1, :]
    o_ref[...] = acc.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group", "block_m", "block_n", "interpret", "out_dtype"),
)
def int4_weight_matmul(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scale: jnp.ndarray,
    group: int = 128,
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool | None = None,
    out_dtype=None,
):
    """x [m, Kp] (any float dtype; computed in bf16) times a split-half
    packed int4 weight [Kp/2, n] with group scales [Kp/group, n] f32.

    Kp (= 2 * packed rows) must be a multiple of 2*group and x's last dim
    must already be padded to Kp — `quantize/weights.py:mm` does both.
    Returns [m, n] in `out_dtype` (default x.dtype); m and n are arbitrary.
    """
    if x.ndim != 2 or packed.ndim != 2 or scale.ndim != 2:
        raise ValueError("int4_weight_matmul wants x [m,Kp], packed [Kp/2,n], scale [Kp/group,n]")
    m, kp = x.shape
    half, n = packed.shape
    if kp != 2 * half or half % group != 0 or scale.shape != (kp // group, n):
        raise ValueError(
            f"shape mismatch: x {x.shape}, packed {packed.shape}, "
            f"scale {scale.shape}, group {group}"
        )
    if interpret is None:
        interpret = use_interpret_mode()
    if out_dtype is None:
        out_dtype = x.dtype
    block_m = min(block_m, max(8, -(-m // 8) * 8))
    block_n = min(block_n, max(128, -(-n // 128) * 128))

    # scoped-VMEM budget with Mosaic's double-buffered input tiles: the
    # full-contraction body holds x_lo + x_hi ([block_m, K/2] bf16 each),
    # the packed tile ([K/2, block_n] int8) and both scale tiles — at
    # d_model 4096 (K=16384, prefill block_m=256) that is ~24 MB and the
    # compile dies (observed in the round-5 bench d4096 arm). Shrink
    # block_m first (the dots stay wide), then block_n, until the
    # double-buffered tiles fit ~12 MB.
    def _tile_bytes(bm, bn):
        return 2 * (2 * bm * half * 2 + half * bn + 2 * (kp // group) * bn * 4)

    while _tile_bytes(block_m, block_n) > 12 * 1024 * 1024 and block_m > 8:
        block_m //= 2
    while _tile_bytes(block_m, block_n) > 12 * 1024 * 1024 and block_n > 128:
        block_n //= 2

    xb = x.astype(jnp.bfloat16)
    pad_m = (-m) % block_m
    if pad_m:
        xb = jnp.pad(xb, ((0, pad_m), (0, 0)))
    pb = _pad_to_cols(packed, block_n)
    # scale rows split as [lo-half groups ; hi-half groups]; the halves ride
    # a leading dim of 2 so each half's block is FULL in its group dim
    # (n_g_half may not be a multiple of 8 — Mosaic allows full-or-aligned).
    n_g_half = half // group
    sb = _pad_to_cols(scale.astype(jnp.float32), block_n).reshape(2, n_g_half, -1)

    out = pl.pallas_call(
        functools.partial(_kernel, group=group, out_dtype=out_dtype),
        grid=(cdiv(xb.shape[0], block_m), cdiv(pb.shape[1], block_n)),
        in_specs=[
            pl.BlockSpec((block_m, half), lambda i, j: (i, 0)),      # x lo half
            pl.BlockSpec((block_m, half), lambda i, j: (i, 1)),      # x hi half
            pl.BlockSpec((half, block_n), lambda i, j: (0, j)),      # packed
            pl.BlockSpec((1, n_g_half, block_n), lambda i, j: (0, 0, j)),  # s lo
            pl.BlockSpec((1, n_g_half, block_n), lambda i, j: (1, 0, j)),  # s hi
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((xb.shape[0], pb.shape[1]), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(xb, xb, pb, sb, sb)
    return out[:m, :n]


def _pad_to_cols(x: jnp.ndarray, mult: int) -> jnp.ndarray:
    pad = (-x.shape[1]) % mult
    return jnp.pad(x, ((0, 0), (0, pad))) if pad else x
