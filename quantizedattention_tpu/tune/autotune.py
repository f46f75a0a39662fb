"""Block-size sweeps with a persisted best-config cache the defaults consult.

The TPU analogue of the reference's tune-then-pin workflow: Helion's
`PowerOfTwoFragment(32, 256, 32)` sweep plus the recorded best RTX3080 config
left in a comment (reference: attention_int8.py:155-159,
attention_bf16.py:734-748, README.md:57-67). Here:

  * `autotune`       — forward sweep over (block_q, block_kv,
                       block_kv_compute), candidates up to the full padded
                       sequence (the pinned v5e optimum block_kv=8192 IS in
                       the sweep space);
  * `autotune_bwd`   — independent backward sweep over (block_q_bwd,
                       block_kv_bwd);
  * `autotune_decode`— decode-kernel block_kv sweep (kv_cache /
                       paged_decode share the dimension);
  * winners persist to JSON keyed by (kind, q_tokens, kv_tokens, head_dim,
    device kind) — and `tune.config.default_block_config` CONSULTS that
    cache, so a tuned shape is picked up by the public API on the next
    call with no plumbing.
"""

from __future__ import annotations

import dataclasses
import functools
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


def _cache_key(kind: str, q_tokens: int, kv_tokens: int, head_dim: int,
               device_kind: str) -> str:
    return f"{kind}|q{q_tokens}|kv{kv_tokens}|d{head_dim}|{device_kind}"


def _load_cache() -> dict:
    path = _cache_path()
    if os.path.exists(path):
        try:
            with open(path) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            return {}
    return {}


@functools.lru_cache(maxsize=256)
def _cached_entry(path: str, mtime: float, key: str):
    cache = _load_cache()
    return tuple(sorted(cache[key].items())) if key in cache else None


def load_cached_config(kind: str, q_tokens: int, kv_tokens: int,
                       head_dim: int) -> BlockConfig | None:
    """Cheap (mtime-memoized) lookup of a previously tuned config."""
    path = _cache_path()
    try:
        # nanosecond mtime + size: second-resolution mtime can alias a
        # write-then-read within the same second and serve a stale memo
        st = os.stat(path)
        mtime = (st.st_mtime_ns, st.st_size)
    except OSError:
        return None
    try:
        device_kind = jax.devices()[0].device_kind
    except RuntimeError:
        return None
    entry = _cached_entry(path, mtime, _cache_key(kind, q_tokens, kv_tokens, head_dim, device_kind))
    if entry is None:
        return None
    d = dict(entry)
    d = {k: v for k, v in d.items() if k in BlockConfig.__dataclass_fields__}
    return BlockConfig(**d)


def save_config(kind: str, q_tokens: int, kv_tokens: int, head_dim: int,
                config) -> None:
    path = _cache_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cache = _load_cache()
    entry = dataclasses.asdict(config) if dataclasses.is_dataclass(config) else dict(config)
    cache[_cache_key(kind, q_tokens, kv_tokens, head_dim, jax.devices()[0].device_kind)] = entry
    with open(path, "w") as f:
        json.dump(cache, f, indent=2, sort_keys=True)


def _time_one(fn, args, iters: int = 10, n_chain: int = 64) -> float:
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


def _pow2_upto(lo: int, hi: int):
    c, out = lo, []
    while c <= hi:
        out.append(c)
        c *= 2
    return out


def _padded(tokens: int) -> int:
    return -(-tokens // 128) * 128


def autotune(
    kind: str,
    make_fn,
    args,
    q_tokens: int,
    kv_tokens: int,
    block_candidates=None,
    kv_candidates=None,
    compute_candidates=(0, 512, 1024),
    iters: int = 10,
    use_cache: bool = True,
):
    """Forward sweep over (block_q, block_kv, block_kv_compute); pin the
    winner. `make_fn(config) -> callable(*args)` builds the kernel under
    test. Returns (best_config, best_seconds — None on cache hit).

    block_q candidates default to powers of two up to min(1024, padded q);
    block_kv up to min(8192, padded kv) (large DMA blocks with compute
    subtiles are the measured v5e optimum — the sweep space contains the
    pinned defaults). Candidates that fail to compile (VMEM overflow) are
    skipped, mirroring the reference's shared-memory-limited pinning
    (attention_bf16.py:302-307).
    """
    head_dim = jax.tree_util.tree_leaves(args)[0].shape[-1]
    if use_cache:
        cached = load_cached_config(kind, q_tokens, kv_tokens, head_dim)
        if cached is not None:
            return cached, None

    if block_candidates is None:
        block_candidates = _pow2_upto(128, min(1024, _padded(q_tokens)))
    if kv_candidates is None:
        hi = min(8192, _padded(kv_tokens))
        kv_candidates = _pow2_upto(min(256, hi), hi)

    best_cfg, best_t = None, float("inf")
    for bq, bkv in itertools.product(block_candidates, kv_candidates):
        for sub in compute_candidates:
            if sub and (sub >= bkv or bkv % sub):
                continue
            cfg = BlockConfig(block_q=bq, block_kv=bkv, block_kv_compute=sub)
            try:
                t = _time_one(make_fn(cfg), args, iters=iters)
            except Exception:
                continue
            if t < best_t:
                best_cfg, best_t = cfg, t
    if best_cfg is None:
        raise RuntimeError(f"autotune({kind}): no candidate compiled")
    if use_cache:
        # the forward sweep must not clobber backward blocks: merge with any
        # separately tuned bwd blocks, else inherit the pinned defaults
        # (NOT the dataclass defaults, which are conservative 128s)
        prev = load_cached_config(kind, q_tokens, kv_tokens, head_dim)
        if prev is None:
            from quantizedattention_tpu.tune.config import _DEFAULTS

            prev = _DEFAULTS[kind].clamp(q_tokens, kv_tokens)
        best_cfg = dataclasses.replace(
            best_cfg, block_q_bwd=prev.block_q_bwd, block_kv_bwd=prev.block_kv_bwd
        )
        save_config(kind, q_tokens, kv_tokens, head_dim, best_cfg)
    return best_cfg, best_t


def autotune_bwd(
    kind: str,
    make_fn,
    args,
    q_tokens: int,
    kv_tokens: int,
    candidates=None,
    iters: int = 10,
    use_cache: bool = True,
):
    """Independent backward sweep over (block_q_bwd, block_kv_bwd).

    `make_fn(config) -> callable(*args)` should run the BACKWARD under test
    (e.g. jax.grad of the public API with this config). The winner's bwd
    blocks merge into the cached entry for (kind, shape), preserving any
    tuned forward blocks.
    """
    if kind == "int8":
        # the int8 backward's tiling is pinned to the forward's quantization
        # grain (the residual contract — ops/int8_bwd.py); sweeping bwd
        # blocks would time identical kernels and persist a noise 'winner'.
        # Tune the forward grain (block_kv_compute) instead.
        raise ValueError(
            "int8 backward tiling is fixed by the quantization grain; "
            "sweep the forward's block_kv_compute via autotune() instead"
        )
    head_dim = jax.tree_util.tree_leaves(args)[0].shape[-1]
    if candidates is None:
        candidates = _pow2_upto(128, min(1024, _padded(min(q_tokens, kv_tokens))))

    base = load_cached_config(kind, q_tokens, kv_tokens, head_dim)
    if base is None:
        from quantizedattention_tpu.tune.config import default_block_config

        base = default_block_config(kind, q_tokens, kv_tokens)

    best_cfg, best_t = None, float("inf")
    for bq, bkv in itertools.product(candidates, candidates):
        cfg = dataclasses.replace(base, block_q_bwd=bq, block_kv_bwd=bkv)
        try:
            t = _time_one(make_fn(cfg), args, iters=iters)
        except Exception:
            continue
        if t < best_t:
            best_cfg, best_t = cfg, t
    if best_cfg is None:
        raise RuntimeError(f"autotune_bwd({kind}): no candidate compiled")
    if use_cache:
        save_config(kind, q_tokens, kv_tokens, head_dim, best_cfg)
    return best_cfg, best_t


def resolve_decode_block(max_len: int, head_dim: int, default: int = 1024,
                         kind: str = "decode") -> int:
    """block_kv for the decode kernels on this device kind: the tuned winner
    for (kv=max_len, head_dim) when `autotune_decode` has run, else `default`.

    This is the zero-plumbing leg of the tune-then-pin workflow
    (reference README.md:57-67): kv_cache.decode_attention calls this when
    no explicit block is passed, so a sweep immediately reaches the
    slotted-cache serving hot path. (The PAGED decode kernel's block IS
    the page size — a cache-layout choice fixed at engine init — so tuned
    decode blocks do not apply there.) Resolution is a pure host-side
    (mtime-memoized) file read — call it OUTSIDE jit or at trace time
    only. NOTE from the v5e sweeps: kernel-standalone winners do not
    always transfer to the caller's full step (docs/ARCHITECTURE.md §4) —
    prefer sweeping the full step and pinning via save_config.
    """
    cfg = load_cached_config(kind, 1, max_len, head_dim)
    if cfg is None and kind != "decode":
        # int4 ("decode4") falls back to the int8 sweep's winner: the same
        # online-softmax structure at half the payload bytes usually wants
        # the same or a larger block; a dedicated sweep refines it.
        cfg = load_cached_config("decode", 1, max_len, head_dim)
    return cfg.block_kv if cfg is not None else default


def autotune_decode(
    make_fn,
    args,
    max_len: int,
    candidates=None,
    iters: int = 10,
    use_cache: bool = True,
    kind: str = "decode",
):
    """Decode-kernel sweep over block_kv (the lane-axis block of
    kv_cache.decode_attention / paged_decode_attention).

    `make_fn(block_kv) -> callable(*args)`. Returns (best_block_kv,
    best_seconds). Cached under kind='decode' with q_tokens=1.
    """
    head_dim = jax.tree_util.tree_leaves(args)[0].shape[-1]
    if use_cache:
        cached = load_cached_config(kind, 1, max_len, head_dim)
        if cached is not None:
            return cached.block_kv, None
    if candidates is None:
        lo = 256 if kind == "decode4" else 128  # int4 blocks cover pack blocks
        candidates = _pow2_upto(lo, min(2048, _padded(max_len)))

    best_b, best_t = None, float("inf")
    for bkv in candidates:
        try:
            t = _time_one(make_fn(bkv), args, iters=iters)
        except Exception:
            continue
        if t < best_t:
            best_b, best_t = bkv, t
    if best_b is None:
        raise RuntimeError("autotune_decode: no candidate compiled")
    if use_cache:
        save_config(kind, 1, max_len, head_dim,
                    BlockConfig(block_q=128, block_kv=best_b))
    return best_b, best_t
