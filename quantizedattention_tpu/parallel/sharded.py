"""Head-sharded tensor parallelism + data parallelism via shard_map.

Heads are embarrassingly parallel in every kernel here — the Pallas grid
already iterates b·h independently (the same fact the reference exploits
single-device at attention_bf16.py:195) — so sharding the head axis over the
`model` mesh axis and batch over `data` needs zero collectives inside
attention. XLA inserts the psum later, at the user's output projection.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P

from quantizedattention_tpu.ops.api import (
    attention_jvp,
    flash_attention_bf16,
    sage_attention_int8,
)
from quantizedattention_tpu.tune.config import BlockConfig

_KINDS = {
    "bf16": flash_attention_bf16,
    "int8": sage_attention_int8,
    "jvp": attention_jvp,
}


def make_sharded_attention(
    mesh: Mesh,
    kind: str = "bf16",
    causal: bool = False,
    sm_scale: float | None = None,
    config: BlockConfig | None = None,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Build a jitted (q, k, v) -> O with batch on `data_axis`, heads on
    `model_axis`. Differentiable: custom_vjp/custom_jvp rules shard with it.
    """
    fn = _KINDS[kind]
    spec = P(data_axis, model_axis, None, None)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    def sharded(q, k, v):
        return fn(q, k, v, causal=causal, sm_scale=sm_scale, config=config)

    return jax.jit(sharded)
