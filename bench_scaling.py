"""Weak-scaling harness for the distributed attention paths.

North-star target (BASELINE.json): ">=85% tokens/s scaling efficiency from
1 host to N>=2 hosts". This harness measures it: fixed per-device work
(weak scaling), ring attention over the `context` axis, efficiency =
t(1 device) / t(N devices) — 1.0 is perfect overlap of the ppermute KV
rotation with the online-softmax compute.

On a real pod slice, run under the pod launcher (jax.distributed.initialize
happens via the environment) and the mesh spans all chips over ICI. On a
dev box this runs on emulated host devices (JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=8) — functional validation
of the sweep, not a performance statement (no ICI exists between emulated
devices; expect sub-linear numbers there).

Prints one JSON line per mesh size and a final summary line:
  {"metric": "ring_attention_weak_scaling_efficiency", ...}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chained_time(fn, args, n_chain=32, reps=5):
    """Per-call seconds via the shared relay-proof harness."""
    from quantizedattention_tpu.utils.profiling import chained_seconds

    return chained_seconds(fn, *args, n_chain=n_chain, reps=reps)


def bench_ring(n_devices: int, t_local: int = 1024, batch: int = 1, heads: int = 4,
               head_dim: int = 64, kind: str = "bf16"):
    """Ring attention over `n_devices` context shards, t_local tokens each."""
    from quantizedattention_tpu.parallel import make_attention_mesh, make_ring_attention

    mesh = make_attention_mesh(data=1, model=1, context=n_devices)
    attn = make_ring_attention(mesh, kind=kind, causal=True)
    t_global = t_local * n_devices
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    dtype = jnp.bfloat16 if kind == "bf16" else jnp.float32
    q = jax.random.normal(kq, (batch, heads, t_global, head_dim), dtype)
    k = jax.random.normal(kk, (batch, heads, t_global, head_dim), dtype)
    v = jax.random.normal(kv, (batch, heads, t_global, head_dim), dtype)

    def step(q_, k_, v_):
        return attn(q_, k_, v_).astype(q_.dtype)

    t = chained_time(step, (q, k, v))
    # causal flops over the GLOBAL sequence
    flops = 2 * 2 * batch * heads * t_global * t_global * head_dim * 0.5
    return t, flops


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    n_dev = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev]
    log(f"devices: {n_dev} x {jax.devices()[0].device_kind}; ring kind={kind}")

    base_rate = None
    eff = {}
    rows = []
    for n in sizes:
        t, flops = bench_ring(n, kind=kind)
        rate = flops / t
        if n == 1:
            base_rate = rate
        # scaling efficiency = aggregate throughput vs n x the single-device
        # throughput. (Per-device work is NOT constant here: causal ring
        # attention over a t_local*n global sequence does ~n x the per-device
        # FLOPs of the n=1 case, so comparing raw step times would punish
        # perfect hardware — throughput ratio is the honest metric.)
        eff[n] = rate / (n * base_rate)
        rows.append({"n": n, "ms_per_step": round(t * 1e3, 3),
                     "tflops_global": round(rate / 1e12, 2),
                     "efficiency": round(eff[n], 4)})
        log(f"n={n:2d}: {t*1e3:8.3f} ms/step  {rate/1e12:6.1f} TFLOP/s "
            f"(global)  efficiency={eff[n]*100:5.1f}%")

    n_max = sizes[-1]
    print(json.dumps({
        "metric": f"ring_attention_weak_scaling_efficiency_{kind}_n{n_max}",
        "value": round(eff[n_max], 4),
        "unit": "fraction",
        "vs_baseline": round(eff[n_max] / 0.85, 4),
        "device_kind": jax.devices()[0].device_kind,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
