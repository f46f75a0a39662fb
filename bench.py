"""Benchmark: int8 attention throughput vs bf16 SDPA on one TPU chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json north-star): int8 fused-attention speedup over
the XLA bf16 SDPA anchor at the reference's canonical shape
(batch=8, heads=35, seq=1024, d=64; attention_bf16.py:567-571), causal.
Target is >= 2.0x, so vs_baseline = speedup / 2.0.

Supporting detail (stderr): bf16-corrected kernel vs SDPA (the reference's
own headline was 0.90x SDPA on RTX 3080, attention_bf16.py:755), TFLOP/s,
and accuracy envelopes vs the fp32 oracle.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chained_time(step_fn, q, k, v, n_chain=20, reps=5):
    """Per-call seconds, measured by chaining n_chain data-dependent calls
    inside one jit (step output feeds the next step's q), so the device is
    forced to serialize real work — immune to async-dispatch timing lies.
    step_fn: (q, k, v) -> array of q's shape/dtype.
    """

    @jax.jit
    def chained(q_, k_, v_):
        out = jax.lax.fori_loop(0, n_chain, lambda i, acc: step_fn(acc, k_, v_), q_)
        # reduce to a scalar so the host-side fetch below forces execution
        return jnp.sum(out.astype(jnp.float32))

    float(chained(q, k, v))  # warmup/compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        # float() fetches the scalar to the host — on this remote-execution
        # relay, block_until_ready alone does NOT force the device work
        float(chained(q, k, v))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] / n_chain


def main():
    from quantizedattention_tpu.ops.flash_fwd import flash_attention_fwd
    from quantizedattention_tpu.ops.int8_fwd import int8_attention_fwd
    from quantizedattention_tpu.reference import reference_attention
    from quantizedattention_tpu.utils.testing import mismatch_report

    B, H, T, D = 8, 35, 1024, 64
    causal = True
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, T, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, T, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, T, D), jnp.float32)
    q16, k16, v16 = (x.astype(jnp.bfloat16) for x in (q, k, v))

    # ---- baseline: XLA's fused SDPA in bf16 (the 1.00x anchor)
    def sdpa_step(q_, k_, v_):
        o = jax.nn.dot_product_attention(
            # dot_product_attention wants [B, T, H, D]
            q_.transpose(0, 2, 1, 3), k_.transpose(0, 2, 1, 3), v_.transpose(0, 2, 1, 3),
            is_causal=causal, implementation="xla",
        )
        return o.transpose(0, 2, 1, 3).astype(q_.dtype)

    def bf16_step(q_, k_, v_):
        return flash_attention_fwd(q_, k_, v_, causal=causal)[0].astype(q_.dtype)

    def int8_step(q_, k_, v_):
        return int8_attention_fwd(q_, k_, v_, causal=causal)[0]

    t_sdpa = chained_time(sdpa_step, q16, k16, v16)
    t_bf16 = chained_time(bf16_step, q16, k16, v16)
    t_int8 = chained_time(int8_step, q, k, v)

    # causal attention FLOPs: 2 matmuls * B*H*T*T*D, halved by the mask
    flops = 2 * 2 * B * H * T * T * D * 0.5

    def tflops(t):
        return flops / t / 1e12

    log(f"shape=({B},{H},{T},{D}) causal={causal}  "
        f"(v5e peak ~197 TFLOP/s bf16 / ~394 TOP/s int8 — flag anything above)")
    log(f"SDPA bf16 (XLA anchor): {t_sdpa*1e3:8.3f} ms  {tflops(t_sdpa):6.1f} TFLOP/s")
    log(f"bf16 corrected kernel : {t_bf16*1e3:8.3f} ms  {tflops(t_bf16):6.1f} TFLOP/s  "
        f"{t_sdpa/t_bf16:.2f}x SDPA (reference achieved 0.90x)")
    log(f"int8 kernel (+quant)  : {t_int8*1e3:8.3f} ms  {tflops(t_int8):6.1f} TFLOP/s  "
        f"{t_sdpa/t_int8:.2f}x SDPA (target 2.0x)")

    # ---- accuracy spot-check vs fp32 oracle (guard against fast-but-wrong)
    want = reference_attention(q, k, v, causal=causal)
    rep_bf16 = mismatch_report("bf16", flash_attention_fwd(q16, k16, v16, causal=causal)[0], want, atol=1e-2)
    rep_int8 = mismatch_report("int8", int8_attention_fwd(q, k, v, causal=causal)[0], want, atol=5e-2)
    log(str(rep_bf16) + "  (reference envelope: 915/18350080)")
    log(str(rep_int8))
    if rep_bf16.mismatch_rate > 5e-5 or rep_int8.mismatch_rate > 2e-3:
        log("WARNING: accuracy outside envelope — speedup not claimable")

    speedup = t_sdpa / t_int8
    print(json.dumps({
        "metric": "int8_attention_speedup_vs_bf16_sdpa",
        "value": round(speedup, 4),
        "unit": "x",
        "vs_baseline": round(speedup / 2.0, 4),
    }))


if __name__ == "__main__":
    main()
