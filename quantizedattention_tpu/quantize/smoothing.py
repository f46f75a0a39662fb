"""K-smoothing: subtract the per-(batch, head) channel mean of K over tokens.

SageAttention3's K-smoothing shrinks K's dynamic range before int8
quantization. Because q_i . mean(K) is constant across keys for a fixed query
row, subtracting the mean shifts every logit in a softmax row by the same
amount and therefore leaves the attention output exactly invariant — only the
quantization error changes (it shrinks).

The reference computes the mean over the *batch* axis and broadcasts it with
an inconsistent shape (reference: attention_int8.py:24-25, SURVEY.md §2.3 Q3);
we implement the intended semantics: mean over the token axis, [b, h, 1, d].
"""

from __future__ import annotations

import jax.numpy as jnp

# K-smoothing reduces over the token axis of [batch, head, tokens, head_dim].
K_SMOOTH_AXIS_TOKENS = -2


def k_smooth(k: jnp.ndarray):
    """Return (k - mean, mean) with mean over tokens, shaped [b, h, 1, d]."""
    k_mean = jnp.mean(k.astype(jnp.float32), axis=K_SMOOTH_AXIS_TOKENS, keepdims=True)
    k_mean = k_mean.astype(k.dtype)
    return k - k_mean, k_mean
