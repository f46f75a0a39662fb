"""Shared kernel helpers: masks, scaling constants, padding."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# Large-negative fill for masked logits. Finite (not -inf) so that
# exp2(mask - mask) never produces NaN, and far enough below any real scaled
# logit that exp2 underflows to exactly 0 in f32. The reference used bf16
# -126 *before* scaling (attention_bf16.py:228), which leaks ~2^-22 of
# probability mass per masked key; we mask after scaling with a value that
# underflows exactly. (bf16(-30000) == -29952, still fine.)
MASK_VALUE = -30000.0

# 1/ln(2): converts natural-log-domain softmax to exp2 domain, which is what
# both the reference kernels and TPU's VPU exp2 path use
# (attention_bf16.py:188-193).
LOG2_E = 1.44269504


def qk_scales(head_dim: int, sm_scale: float | None):
    """(sm_scale, qk_scale): natural-domain and exp2-domain logit scales."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)
    return sm_scale, sm_scale * LOG2_E


def tile_mask(
    q_start,
    k_start,
    block_q: int,
    block_kv: int,
    kv_len: int,
    causal: bool,
    k_local_start=None,
):
    """Boolean [block_q, block_kv] mask: True where the logit is valid.

    Standard causal `k <= q` (divergence from the reference's strict `k < q`,
    SURVEY.md §2.3 Q6) combined with a kv-length mask for padded key blocks.

    q_start/k_start are *global* token positions (they include any
    sequence-shard offset, so causal stays correct under ring/context
    parallelism); `k_local_start` is the position within the local shard,
    against which the shard's own padding (kv_len) is masked. When the two
    coincide (single device) pass only k_start.
    """
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
    if k_local_start is None:
        k_local_start = k_start
    mask = (k_local_start + col_iota) < kv_len
    if causal:
        row_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
        mask = jnp.logical_and(mask, (k_start + col_iota) <= row_ids)
    return mask


def pad_tokens(x: jnp.ndarray, block: int, axis: int) -> jnp.ndarray:
    """Zero-pad `axis` up to a multiple of `block`."""
    size = x.shape[axis]
    pad = (-size) % block
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)
