"""Power-of-two block-size sweep with a persisted best-config cache.

The TPU analogue of the reference's tune-then-pin workflow: Helion's
`PowerOfTwoFragment(32, 256, 32)` sweep plus the recorded best RTX3080 config
left in a comment (reference: attention_int8.py:155-159,
attention_bf16.py:734-748, README.md:57-67). Here the sweep is explicit and
the winner is persisted to JSON keyed by (kernel kind, shape, device kind).
"""

from __future__ import annotations

import dataclasses
import itertools
import json
import os
import time

import jax

from quantizedattention_tpu.tune.config import BlockConfig

_CACHE_ENV = "QATTN_TUNE_CACHE"
_DEFAULT_CACHE = os.path.join(os.path.expanduser("~"), ".cache", "quantizedattention_tpu", "tune.json")


def _cache_path() -> str:
    return os.environ.get(_CACHE_ENV, _DEFAULT_CACHE)


def _cache_key(kind: str, shape, device_kind: str) -> str:
    return f"{kind}|{'x'.join(map(str, shape))}|{device_kind}"


def _load_cache() -> dict:
    path = _cache_path()
    if os.path.exists(path):
        try:
            with open(path) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            return {}
    return {}


def load_cached_config(kind: str, shape) -> BlockConfig | None:
    key = _cache_key(kind, shape, jax.devices()[0].device_kind)
    entry = _load_cache().get(key)
    return BlockConfig(**entry) if entry else None


def save_config(kind: str, shape, config: BlockConfig) -> None:
    path = _cache_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cache = _load_cache()
    cache[_cache_key(kind, shape, jax.devices()[0].device_kind)] = dataclasses.asdict(config)
    with open(path, "w") as f:
        json.dump(cache, f, indent=2, sort_keys=True)


def _time_one(fn, args, iters: int = 10, n_chain: int = 32) -> float:
    """Median per-call seconds of fn(*args).

    Chains n_chain data-dependent calls inside one jit and fetches a scalar:
    on remote-relay runtimes block_until_ready does NOT force device
    execution, and every fetch carries a fixed ~26 ms round-trip, so naive
    per-call sync both lies and swamps sub-ms kernels. Requires fn's first
    output to broadcast against args[0] (true for every attention kernel
    here: O has Q's shape).
    """
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        def body(_, acc):
            out = fn(acc, *a[1:])
            first = out[0] if isinstance(out, (tuple, list)) else out
            return (acc + 1e-20 * first).astype(acc.dtype)

        return jnp.sum(jax.lax.fori_loop(0, n_chain, body, a[0]).astype(jnp.float32))

    float(chained(*args))  # warmup/compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(chained(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] / n_chain


def autotune(
    kind: str,
    make_fn,
    args,
    q_tokens: int,
    kv_tokens: int,
    block_candidates=(128, 256, 512),
    iters: int = 10,
    use_cache: bool = True,
):
    """Sweep (block_q, block_kv) over power-of-two candidates; pin the winner.

    `make_fn(config) -> callable(*args)` builds the kernel under test. Returns
    (best_config, best_seconds). Candidates that fail to compile (VMEM
    overflow at large blocks) are skipped, mirroring the reference's
    shared-memory-limited pinning (attention_bf16.py:302-307).
    """
    shape = jax.tree_util.tree_leaves(args)[0].shape
    if use_cache:
        cached = load_cached_config(kind, shape)
        if cached is not None:
            return cached, None

    best_cfg, best_t = None, float("inf")
    for bq, bkv in itertools.product(block_candidates, block_candidates):
        if bq > q_tokens or bkv > kv_tokens:
            continue
        cfg = BlockConfig(block_q=bq, block_kv=bkv, block_q_bwd=min(bq, 256), block_kv_bwd=min(bkv, 256))
        try:
            t = _time_one(make_fn(cfg), args, iters=iters)
        except Exception:
            continue
        if t < best_t:
            best_cfg, best_t = cfg, t
    if best_cfg is None:
        raise RuntimeError(f"autotune({kind}): no candidate compiled")
    if use_cache:
        save_config(kind, shape, best_cfg)
    return best_cfg, best_t
