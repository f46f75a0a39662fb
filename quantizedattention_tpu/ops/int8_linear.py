"""Weight-only int8 matmul kernel: bf16 activations x int8 weights.

Serving-side weight quantization (no reference counterpart — the reference
quantizes only attention operands, attention_int8.py:180-195; weights stay
bf16/f32). Decode at small batch is WEIGHT-bandwidth-bound on TPU: every
step streams every projection matrix out of HBM while the MXU sits idle,
so halving the weight bytes (bf16 -> int8 + one f32 scale per output
channel) approaches a 2x step-time win in the bandwidth limit. v5e's MXU
has no int8 compute-rate advantage (docs/ARCHITECTURE.md §4), so the win
here is purely HBM traffic: the int8 tile converts to bf16 in VMEM and
the dot runs at the ordinary bf16 rate.

Kernel shape: out[m, n] = (x[m, k] @ dequant(w_i8[k, n])) with a per-column
scale applied once per output tile at the LAST k step (not per k-block —
the scale factors out of the contraction). Grid (m, n, k) with k innermost
("arbitrary": the f32 accumulator scratch carries across k steps); m and n
parallel. The weight tile is the only large HBM stream; x re-reads per
n-block are negligible at serving m (8..256 rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantizedattention_tpu.utils.runtime import cdiv, use_interpret_mode


def _pad_to(x: jnp.ndarray, mult: int, axis: int) -> jnp.ndarray:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int, out_dtype):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # int8 -> bf16 happens HERE, on the VMEM-resident tile: HBM saw only
    # int8 bytes. f32 accumulation across k blocks in scratch.
    w = w_ref[...].astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot(
        x_ref[...], w, preferred_element_type=jnp.float32
    )

    @pl.when(kk == n_k - 1)
    def _finish():
        o_ref[...] = (acc_ref[...] * s_ref[...].astype(jnp.float32)).astype(
            out_dtype
        )


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "interpret", "out_dtype"),
)
def int8_weight_matmul(
    x: jnp.ndarray,
    w_i8: jnp.ndarray,
    scale: jnp.ndarray,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool | None = None,
    out_dtype=None,
):
    """x [m, k] (any float dtype; computed in bf16) @ w_i8 [k, n] int8,
    times a per-output-channel f32 `scale` [n]. Returns [m, n] in
    `out_dtype` (default: x.dtype). Arbitrary m/k/n — padded to the block
    grid internally.
    """
    if x.ndim != 2 or w_i8.ndim != 2 or scale.ndim != 1:
        raise ValueError("int8_weight_matmul wants x [m,k], w [k,n], scale [n]")
    if x.shape[1] != w_i8.shape[0] or w_i8.shape[1] != scale.shape[0]:
        raise ValueError(
            f"shape mismatch: x {x.shape}, w {w_i8.shape}, scale {scale.shape}"
        )
    if interpret is None:
        interpret = use_interpret_mode()
    if out_dtype is None:
        out_dtype = x.dtype
    m, k = x.shape
    n = w_i8.shape[1]
    # shrink blocks to the (padded) problem; keep Mosaic's (8, 128) tiling
    block_m = min(block_m, max(8, -(-m // 8) * 8))
    block_k = min(block_k, max(128, -(-k // 128) * 128))
    block_n = min(block_n, max(128, -(-n // 128) * 128))

    xb = _pad_to(_pad_to(x.astype(jnp.bfloat16), block_m, 0), block_k, 1)
    wb = _pad_to(_pad_to(w_i8, block_k, 0), block_n, 1)
    sb = _pad_to(scale.astype(jnp.float32).reshape(1, -1), block_n, 1)

    n_m, n_k, n_n = (
        cdiv(xb.shape[0], block_m),
        cdiv(xb.shape[1], block_k),
        cdiv(wb.shape[1], block_n),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, out_dtype=out_dtype),
        grid=(n_m, n_n, n_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((xb.shape[0], wb.shape[1]), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xb, wb, sb)
    return out[:m, :n]
