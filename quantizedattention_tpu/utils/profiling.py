"""Profiling harness: reliable kernel timing + TFLOP/s on the TPU.

The reference's only benchmark was the commented-out helion run_example
latency harness (attention_bf16.py:481-526). This one is built for the
failure mode we actually hit: on remote-relay execution, block_until_ready
does NOT force device work, so naive timing reports physically impossible
numbers. `chained_seconds` therefore chains n data-dependent calls inside
one jit and fetches a scalar, and `attention_tflops` sanity-bounds results
against chip peak.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp

# Peak dense-matmul throughput per chip, for utilization reporting.
_PEAKS_TFLOPS = {
    "TPU v5 lite": {"bf16": 197.0, "int8": 394.0},
    "TPU v5e": {"bf16": 197.0, "int8": 394.0},
    "TPU v5p": {"bf16": 459.0, "int8": 918.0},
    "TPU v4": {"bf16": 275.0, "int8": 275.0},
}


@dataclasses.dataclass
class KernelTiming:
    seconds: float
    tflops: float
    utilization: float | None  # vs chip peak, when known

    def __str__(self):
        util = f" ({self.utilization*100:.0f}% of peak)" if self.utilization else ""
        return f"{self.seconds*1e3:.3f} ms, {self.tflops:.1f} TFLOP/s{util}"


def chained_seconds(step_fn, q, *rest, n_chain: int = 64, reps: int = 5) -> float:
    """Median per-call seconds of step_fn(q, *rest) -> array like q.

    Chains n_chain data-dependent calls in one jit and fetches a scalar, so
    the measurement survives async dispatch and remote-relay execution. The
    fetch itself carries a fixed round-trip (~26 ms measured on the relay),
    biasing per-call time by that/n_chain — keep n_chain >= 64 for sub-ms
    kernels.
    """

    @jax.jit
    def chained(q_, *rest_):
        out = jax.lax.fori_loop(0, n_chain, lambda i, acc: step_fn(acc, *rest_), q_)
        return jnp.sum(out.astype(jnp.float32))

    float(chained(q, *rest))  # compile + warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(q, *rest))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] / n_chain


def chained_slope_seconds(step_fn, q, *rest, n_lo: int = 64, n_hi: int = 512,
                          reps: int = 5) -> float:
    """Per-call seconds by DIFFERENTIAL chained timing: the slope between a
    short and a long chain, (T(n_hi) - T(n_lo)) / (n_hi - n_lo).

    chained_seconds carries the whole fetch round-trip (~26-30 ms on the
    relay) divided by n_chain as an ADDITIVE bias — ~0.4-0.5 ms/call at
    n_chain=64, which swamps sub-200-us kernels (measured round 5: a
    chained `jnp add` "costs" 476 us/call). The slope cancels every
    per-fetch fixed cost exactly; only true marginal per-iteration work
    remains. Compiles two chain lengths (fori_loop: O(1) compile each).
    """

    def make(n):
        @jax.jit
        def chained(q_, *rest_):
            out = jax.lax.fori_loop(0, n, lambda i, acc: step_fn(acc, *rest_), q_)
            return jnp.sum(out.astype(jnp.float32))
        return chained

    f_lo, f_hi = make(n_lo), make(n_hi)

    def med(f):
        float(f(q, *rest))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(q, *rest))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    return max(0.0, (med(f_hi) - med(f_lo)) / (n_hi - n_lo))


def attention_flops(batch, heads, q_tokens, kv_tokens, head_dim, causal: bool) -> float:
    """MAC-counted FLOPs of softmax attention (2 matmuls), halved if causal."""
    frac = 0.5 if causal else 1.0
    return 2 * 2 * batch * heads * q_tokens * kv_tokens * head_dim * frac


def time_attention(step_fn, q, k, v, causal: bool, dtype: str = "bf16",
                   n_chain: int = 64) -> KernelTiming:
    """Time an attention step (q, k, v) -> array like q; report TFLOP/s."""
    seconds = chained_seconds(step_fn, q, k, v, n_chain=n_chain)
    b, h, t, d = q.shape
    tflops = attention_flops(b, h, t, k.shape[2], d, causal) / seconds / 1e12
    peak = _PEAKS_TFLOPS.get(jax.devices()[0].device_kind, {}).get(dtype)
    return KernelTiming(seconds, tflops, tflops / peak if peak else None)
