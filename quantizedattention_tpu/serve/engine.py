"""Continuous-batching serving engine on the int8 KV cache.

The compute half of the serving layer (the native C++ scheduler in
serve/scheduler.py is the policy half). The reference has no serving path
at all (SURVEY.md §1); the north-star (BASELINE.json) demands "head/KV
tensor-sharding over a multi-host TPU pod slice via shard_map with
quantized KV-cache, continuous batching across hosts".

Engine loop (classic continuous batching):
  * requests join a native FCFS queue (`submit`);
  * each `step` asks the scheduler for ONE action: admit a waiting request
    into a free cache slot via a fused prefill (the whole prompt through
    the causal flash kernel in one pass, prompt K/V quantized into the
    slot), or run ONE batched decode step across every active slot;
  * slots finish independently (EOS or budget) and free immediately, so a
    new request's prefill slides in between decode steps — the decode
    batch never drains to restart.

All decode work is one jitted step over the full slot batch: per-row RoPE
positions, length-masked int8 decode attention (parallel/kv_cache.py), and
an active mask so idle slots never advance. Prompts are right-padded to
power-of-two buckets so prefill compiles once per bucket.

Multi-host: `make_sharded_decode_step` shards slots over the mesh's `data`
axis and attention heads / MLP hidden over `model` (the same Megatron
layout as models/sharded_train.py), with the KV cache sharded on
(slots, kv-heads) — decode attention itself needs zero collectives; only
the out/down projections psum.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quantizedattention_tpu.models.transformer import (
    TransformerConfig,
    decode_step_batched,
    prefill_slot,
    rmsnorm,
    rope,
)
from quantizedattention_tpu.parallel.kv_cache import (
    QuantizedKVCache,
    append_kv,
    decode_attention,
    init_kv_cache,
)
from quantizedattention_tpu.serve.scheduler import DECODE, IDLE, PREFILL, make_scheduler


@dataclasses.dataclass
class GenerationResult:
    request_id: int
    prompt: list[int]
    tokens: list[int]          # generated tokens (includes EOS if hit)
    finish_reason: str         # "eos" | "length"


def _bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class ServingEngine:
    """Continuous-batching engine over `n_slots` KV-cache rows.

    params/cfg: a models.transformer LM. eos_id: optional stop token.
    scheduler: "native" (C++ via ctypes; falls back to the Python twin if
    g++ is unavailable) or "python".
    """

    def __init__(
        self,
        params,
        cfg: TransformerConfig,
        n_slots: int = 4,
        eos_id: int | None = None,
        scheduler: str = "native",
    ):
        self.params = params
        self.cfg = cfg
        self.n_slots = n_slots
        self.eos_id = eos_id
        self.sched = make_scheduler(n_slots, cfg.max_seq, prefer_native=scheduler == "native")

        self.caches = [
            init_kv_cache(n_slots, cfg.n_kv_heads, cfg.max_seq, cfg.head_dim)
            for _ in params["layers"]
        ]
        self.last_tok = jnp.zeros((n_slots,), jnp.int32)
        self.pos = jnp.zeros((n_slots,), jnp.int32)
        self.active = jnp.zeros((n_slots,), bool)

        self._next_id = 0
        self._prompts: dict[int, list[int]] = {}
        self._outputs: dict[int, list[int]] = {}
        self._finished: dict[int, GenerationResult] = {}
        self._slot_req = [-1] * n_slots

        self._decode = jax.jit(functools.partial(decode_step_batched, cfg=cfg))
        self._prefill = jax.jit(functools.partial(prefill_slot, cfg=cfg))

    # -- client side --------------------------------------------------------

    def submit(self, prompt, max_new_tokens: int = 32) -> int:
        """Queue a prompt (sequence of int token ids); returns a request id.

        Raises ValueError if prompt + budget can never fit the KV capacity
        (the scheduler rejects it rather than letting it pend forever).
        """
        prompt = [int(t) for t in prompt]
        rid = self._next_id
        self._next_id += 1
        if not self.sched.submit(rid, len(prompt), max_new_tokens):
            raise ValueError(
                f"request rejected: prompt {len(prompt)} + budget {max_new_tokens} "
                f"> KV capacity {self.cfg.max_seq}"
            )
        self._prompts[rid] = prompt
        self._outputs[rid] = []
        return rid

    def run(self) -> dict[int, GenerationResult]:
        """Drive steps until queue and slots drain; returns all results."""
        while self.step():
            pass
        out, self._finished = self._finished, {}
        return out

    # -- engine side ---------------------------------------------------------

    def step(self) -> bool:
        """One scheduler action (prefill XOR batched decode). False if idle."""
        action, rid, slot = self.sched.next_action()
        if action == IDLE:
            return False
        if action == PREFILL:
            self._do_prefill(rid, slot)
        elif action == DECODE:
            self._do_decode()
        return True

    def _record(self, slot: int, token: int):
        rid = self._slot_req[slot]
        self._outputs[rid].append(token)
        is_eos = self.eos_id is not None and token == self.eos_id
        if self.sched.report_token(slot, is_eos):
            self._finished[rid] = GenerationResult(
                request_id=rid,
                prompt=self._prompts.pop(rid),
                tokens=self._outputs.pop(rid),
                finish_reason="eos" if is_eos else "length",
            )
            self._slot_req[slot] = -1
            self.active = self.active.at[slot].set(False)

    def _do_prefill(self, rid: int, slot: int):
        prompt = self._prompts[rid]
        t_pad = _bucket(len(prompt))
        tokens = jnp.asarray(prompt + [0] * (t_pad - len(prompt)), jnp.int32)
        first_tok, self.caches = self._prefill(
            self.params, self.caches, tokens, jnp.int32(len(prompt)), jnp.int32(slot)
        )
        first = int(first_tok)
        self._slot_req[slot] = rid
        self.last_tok = self.last_tok.at[slot].set(first)
        self.pos = self.pos.at[slot].set(len(prompt))
        self.active = self.active.at[slot].set(True)
        self._record(slot, first)

    def _do_decode(self):
        active_before = [i for i in range(self.n_slots) if self._slot_req[i] >= 0]
        next_tok, self.caches = self._decode(
            self.params, self.caches, self.last_tok, self.pos, self.active
        )
        toks = np.asarray(next_tok)
        self.last_tok = next_tok
        self.pos = self.pos + self.active.astype(jnp.int32)
        for slot in active_before:
            self._record(slot, int(toks[slot]))


# ---------------------------------------------------------------------------
# Multi-host decode: slots on `data`, heads on `model`
# ---------------------------------------------------------------------------

def _sharded_decode_step(params, caches, last_tok, pos, active, cfg: TransformerConfig):
    """Per-device continuous-batching decode step (runs inside shard_map).

    Local shapes: last_tok/pos/active [slots_loc]; cache rows [slots_loc,
    kv_loc, max_len, d]; wq/wk/wv output-sharded, wo/w2 contraction-sharded
    (psum) — the Megatron layout of models/sharded_train.py. Decode
    attention is per-(slot, kv-head) and therefore communication-free.
    """
    n_model = jax.lax.axis_size("model")
    h_loc = cfg.n_heads // n_model
    kv_loc = cfg.n_kv_heads // n_model
    b_loc = last_tok.shape[0]

    x = params["embed"][last_tok][:, None, :]
    positions = pos[:, None]
    new_caches = []
    for layer, cache in zip(params["layers"], caches):
        h = rmsnorm(x, layer["ln1"])
        q = (h @ layer["wq"]).reshape(b_loc, 1, h_loc, cfg.head_dim).transpose(0, 2, 1, 3)
        k = (h @ layer["wk"]).reshape(b_loc, 1, kv_loc, cfg.head_dim).transpose(0, 2, 1, 3)
        v = (h @ layer["wv"]).reshape(b_loc, 1, kv_loc, cfg.head_dim).transpose(0, 2, 1, 3)
        q = rope(q, positions, cfg.rope_base)
        k = rope(k, positions, cfg.rope_base)
        cache = append_kv(cache, k, v, active=active)
        o = decode_attention(q[:, :, 0, :], cache)
        o = o.reshape(b_loc, 1, h_loc * cfg.head_dim)
        x = x + jax.lax.psum(o.astype(x.dtype) @ layer["wo"], "model")
        hh = rmsnorm(x, layer["ln2"])
        x = x + jax.lax.psum(jax.nn.gelu(hh @ layer["w1"]) @ layer["w2"], "model")
        new_caches.append(cache)
    x = rmsnorm(x, params["final_norm"])
    logits = x[:, 0] @ params["unembed"]
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), new_caches


def cache_specs(data_axis: str = "data", model_axis: str = "model") -> QuantizedKVCache:
    """PartitionSpec tree for one layer's QuantizedKVCache: slots on data,
    KV heads on model, sequence+scales replicated along their own axes."""
    payload = P(data_axis, model_axis, None, None)
    return QuantizedKVCache(
        k_i8=payload, sk=payload, v_i8=payload, sv=payload, length=P(data_axis)
    )


def make_sharded_decode_step(mesh: Mesh, cfg: TransformerConfig):
    """Jitted multi-chip decode step: (params, caches, last_tok, pos, active)
    -> (next_tok, caches), slots sharded over `data`, heads over `model`.

    Param layout = models.sharded_train.param_specs (Megatron TP). Use
    jax.device_put with `serving_shardings(mesh, cfg)` to place the operands.
    """
    from quantizedattention_tpu.models.sharded_train import param_specs

    if cfg.n_kv_heads % mesh.shape["model"] != 0:
        raise ValueError("n_kv_heads must divide the model axis")

    specs = param_specs(cfg)
    vec = P("data")
    cspecs = [cache_specs() for _ in range(cfg.n_layers)]

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(specs, cspecs, vec, vec, vec),
        out_specs=(vec, cspecs),
        check_vma=False,
    )
    def step(params, caches, last_tok, pos, active):
        return _sharded_decode_step(params, caches, last_tok, pos, active, cfg)

    return step


def serving_shardings(mesh: Mesh, cfg: TransformerConfig):
    """(param_shardings, cache_shardings, vector_sharding) NamedSharding trees
    for placing engine state before calling the sharded decode step."""
    from quantizedattention_tpu.models.sharded_train import param_specs

    to_shard = lambda spec: NamedSharding(mesh, spec)
    pshard = jax.tree_util.tree_map(to_shard, param_specs(cfg))
    cshard = [
        jax.tree_util.tree_map(to_shard, cache_specs()) for _ in range(cfg.n_layers)
    ]
    return pshard, cshard, to_shard(P("data"))
