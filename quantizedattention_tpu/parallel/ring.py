"""Ring attention over an ICI ring (sequence/context parallelism).

New capability vs the reference (its max tested sequence is 1024 on one GPU,
SURVEY.md §2.4): KV shards rotate around the `context` mesh axis via
jax.lax.ppermute — point-to-point, neighbor-only, so the transfer rides ICI
at full bandwidth — while every chip streams its partial online softmax over
the KV block currently in front of it. Partials (O_i, lse_i) are merged with
the exact rescale identity the kernels already use internally
(attention_bf16.py:276-280): the merge is associative, so the ring order
doesn't matter.

The ppermute for step s+1 is issued *before* step s's kernel so XLA's
latency-hiding scheduler overlaps transfer with compute.

Causal masking uses the shard trichotomy (valid because q and kv are sharded
identically): step 0 is the aligned diagonal block (causal kernel); later
steps hold KV from shard src = (idx − step) mod n, which is either entirely
in the past (full attention) or entirely in the future (skip — zero
contribution).

For the int8 path, each chip quantizes its KV shard once and the ring
rotates the int8 payload *and its per-block scale table* — half the ICI
bytes of a bf16 ring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from quantizedattention_tpu.ops.flash_fwd import flash_attention_fwd
from quantizedattention_tpu.ops.int8_fwd import (
    int8_attention_fwd_from_quantized,
    quantize_qkv,
)
from quantizedattention_tpu.tune.config import BlockConfig, default_block_config

_NEG_INF = float("-inf")


def _merge_partials(o1, lse1, o2, lse2):
    """Combine two normalized partial attentions via their exp2-domain lse."""
    m = jnp.maximum(lse1, lse2)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    w1 = jnp.where(jnp.isfinite(lse1), jnp.exp2(lse1 - m_safe), 0.0)
    w2 = jnp.where(jnp.isfinite(lse2), jnp.exp2(lse2 - m_safe), 0.0)
    l = w1 + w2
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o = (o1 * w1[..., None] + o2 * w2[..., None]) / l_safe[..., None]
    lse = jnp.where(l == 0.0, _NEG_INF, m + jnp.log2(l_safe))
    return o, lse


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    causal: bool = False,
    sm_scale: float | None = None,
    config: BlockConfig | None = None,
    kind: str = "bf16",
):
    """Ring attention on per-device shards — call inside shard_map.

    q/k/v: local shards [b, h, t_local, d], sequence sharded identically on
    `axis_name`. kind: "bf16" (corrected-bf16 kernel) or "int8" (quantized
    ring). Returns the local O shard in f32.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    batch, head, t_local, head_dim = q.shape

    if config is None:
        config = default_block_config(kind, t_local, t_local)

    if kind == "int8":
        (q_i8, sq), k_res, v_res = quantize_qkv(q, k, v, config)
        dims = (batch, head, t_local, t_local, head_dim)

        def attend(kv_state, causal_step):
            (k_i8, sk), (v_i8, sv) = kv_state
            return int8_attention_fwd_from_quantized(
                ((q_i8, sq), (k_i8, sk), (v_i8, sv)), dims,
                causal=causal_step, sm_scale=sm_scale, config=config,
            )

        kv_state = (k_res, v_res)
    elif kind == "bf16":

        def attend(kv_state, causal_step):
            k_blk, v_blk = kv_state
            return flash_attention_fwd(
                q, k_blk, v_blk, causal=causal_step, sm_scale=sm_scale, config=config
            )

        kv_state = (k, v)
    else:
        raise ValueError(f"unknown ring kind {kind!r}")

    def rotate(state):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), state
        )

    o = jnp.zeros((batch, head, t_local, head_dim), jnp.float32)
    lse = jnp.full((batch, head, t_local), _NEG_INF, jnp.float32)

    for step in range(n):
        # issue the transfer for the next step before computing this one, so
        # the collective-permute overlaps the attention kernel
        kv_next = rotate(kv_state) if step < n - 1 else None

        if causal:
            if step == 0:
                # aligned shard: the diagonal block, ordinary causal kernel
                o_p, lse_p = attend(kv_state, True)
            else:
                # src shard is strictly past (attend fully) or future (skip)
                src = (idx - step) % n

                def _full(kv):
                    return attend(kv, False)

                def _skip(kv):
                    return (
                        jnp.zeros_like(o),
                        jnp.full_like(lse, _NEG_INF),
                    )

                o_p, lse_p = jax.lax.cond(src < idx, _full, _skip, kv_state)
        else:
            o_p, lse_p = attend(kv_state, False)

        o, lse = _merge_partials(o, lse, o_p, lse_p)
        if kv_next is not None:
            kv_state = kv_next

    return o


def make_ring_attention(
    mesh: Mesh,
    kind: str = "bf16",
    causal: bool = False,
    sm_scale: float | None = None,
    config: BlockConfig | None = None,
    data_axis: str = "data",
    model_axis: str = "model",
    context_axis: str = "context",
):
    """Jitted ring attention: batch on data, heads on model, sequence on
    context. q/k/v: [batch, head, tokens, head_dim] global arrays."""
    spec = P(data_axis, model_axis, context_axis, None)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    def sharded(q, k, v):
        return ring_attention(
            q, k, v, context_axis, causal=causal, sm_scale=sm_scale,
            config=config, kind=kind,
        )

    return jax.jit(sharded)
