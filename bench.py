"""Benchmark: int8 attention throughput vs bf16 SDPA on one TPU chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json north-star): int8 fused-attention speedup
over the XLA bf16 SDPA anchor at BASELINE config 3's long-sequence regime
(B=4, H=16, seq=4096, d=64, causal) — "int8 SageAttention3-style fwd,
seq=2048-8192". Target is >= 2.0x, so vs_baseline = speedup / 2.0.
Round 3 on: the int8 time is the best accuracy-guarded int8 FORWARD — the
fused inference kernel (in-kernel quantization, zero HBM residuals), with
the residual-materializing training forward reported alongside on stderr.

Supporting detail (stderr): the reference's canonical shape
(8, 35, 1024, 64 — attention_bf16.py:567-571) for both kernels vs SDPA (the
reference's own headline was 0.90x SDPA on RTX 3080, attention_bf16.py:755),
plus accuracy envelopes vs the fp32 oracle at both shapes.

Timing note: this environment executes through a remote relay where
block_until_ready does not force device work, so each measurement chains
n data-dependent kernel calls inside one jit and fetches a scalar.
"""

import json
import subprocess
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _probe_once(code: str, deadline_s: float, tag: str, attempt: int,
                retries: int) -> bool:
    try:
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=deadline_s, capture_output=True, text=True,
        )
        if r.returncode == 0:
            log(f"backend probe [{tag}] ok in {time.time() - t0:.0f}s: "
                f"{r.stdout.strip()}")
            return True
        log(f"backend probe [{tag}] attempt {attempt + 1}/{retries} failed "
            f"(rc={r.returncode}): "
            f"{r.stderr.strip().splitlines()[-1] if r.stderr.strip() else ''}")
    except subprocess.TimeoutExpired:
        log(f"backend probe [{tag}] attempt {attempt + 1}/{retries} timed "
            f"out after {deadline_s:.0f}s")
    return False


def probe_backend() -> bool:
    """Bounded two-stage device-contact probe. The relay has two distinct
    failure modes, both observed eating captures:
      - fully down: jax.devices() hangs indefinitely (ate BENCH_r03) —
        stage 1 enumerates devices in a SUBPROCESS with a short deadline
        and fails fast;
      - half-up / slow-warming: enumeration answers but the first
        compile+execute takes minutes (measured 209 s on 2026-08-19) —
        stage 2 runs a tiny compute with a generous deadline so a
        slow-warming relay doesn't read as "down".
    Returns True when a device executed work; False means the backend is
    unusable and the caller should fail fast with a clear message."""
    dev_code = "import jax; print(jax.devices()[0].platform)"
    for attempt in range(3):
        if _probe_once(dev_code, 75.0, "devices", attempt, 3):
            break
        if attempt == 2:
            return False
        time.sleep(10.0 * (attempt + 1))
    compute_code = ("import jax, jax.numpy as jnp; "
                    "x = float(jnp.sum(jnp.ones((8, 8)))); "
                    "print(jax.devices()[0].platform, x)")
    # escalating deadlines: the worst observed slow-warm compile was 209 s
    # (2026-08-19) and 240 s alone left only ~15% headroom — a marginally
    # slower warm-up day must not read as "down". The fully-down path still
    # fails fast: it dies at stage 1's 75 s enumeration probe, never here.
    for attempt, deadline in enumerate((240.0, 360.0, 480.0)):
        if _probe_once(compute_code, deadline, "compute", attempt, 3):
            return True
        if attempt < 2:
            time.sleep(30.0)
    return False


# Measured once per run (main): total seconds of a TRIVIAL 64-iter chain —
# i.e. the fetch round-trip alone. chained_time carries RTT/n_chain as an
# ADDITIVE per-call bias (~0.4-0.5 ms at n_chain=64; round-5 measurement:
# a chained `jnp add` "costs" 476 us/call, experiments/call_floor.py).
# Stderr rows report bias-corrected (debiased) times alongside the legacy
# ones; the stdout HEADLINE keeps the legacy (biased) methodology for
# comparability with BENCH_r01-r04 — the bias inflates numerator and
# denominator alike, so the legacy ratio UNDERSTATES the true speedup
# (conservative direction).
_FETCH_FLOOR_S = 0.0


def measure_fetch_floor(n_chain=64):
    """Total seconds of a trivial n_chain-iter chain = the per-fetch RTT."""
    global _FETCH_FLOOR_S
    x = jnp.ones((8, 128), jnp.float32)

    @jax.jit
    def chained(x_):
        out = jax.lax.fori_loop(0, n_chain, lambda i, a: a + 1.0, x_)
        return jnp.sum(out)

    float(chained(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chained(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    _FETCH_FLOOR_S = ts[len(ts) // 2]
    log(f"fetch floor (trivial 64-iter chain total): {_FETCH_FLOOR_S*1e3:.1f} ms "
        f"-> per-call bias at n_chain=64: {_FETCH_FLOOR_S/n_chain*1e6:.0f} us")
    return _FETCH_FLOOR_S


def _debias(t, n_chain=64):
    """Remove the per-call fetch bias (never below 10% of the raw time)."""
    return max(t - _FETCH_FLOOR_S / n_chain, 0.1 * t)


def chained_time(step_fn, q, k, v, n_chain=64, reps=5):
    """Per-call seconds via n_chain data-dependent calls inside one jit.

    n_chain must be large: the relay carries a ~26 ms fixed round-trip per
    fetch (measured: a trivial 32-iter and 256-iter chain both total ~26 ms),
    so per-call bias is ~26/n_chain ms.
    """

    @jax.jit
    def chained(q_, k_, v_):
        out = jax.lax.fori_loop(0, n_chain, lambda i, acc: step_fn(acc, k_, v_), q_)
        return jnp.sum(out.astype(jnp.float32))

    float(chained(q, k, v))  # warmup/compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(q, k, v))  # the fetch forces execution
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] / n_chain


def make_steps(causal):
    from quantizedattention_tpu.ops.flash_fwd import flash_attention_fwd
    from quantizedattention_tpu.ops.int8_fwd import (
        int8_attention_fwd,
        int8_attention_fwd_fused,
    )

    def sdpa_step(q_, k_, v_):
        o = jax.nn.dot_product_attention(
            q_.transpose(0, 2, 1, 3), k_.transpose(0, 2, 1, 3), v_.transpose(0, 2, 1, 3),
            is_causal=causal, implementation="xla",
        )
        return o.transpose(0, 2, 1, 3).astype(q_.dtype)

    def bf16_step(q_, k_, v_):
        return flash_attention_fwd(q_, k_, v_, causal=causal)[0].astype(q_.dtype)

    def int8_step(q_, k_, v_):
        return int8_attention_fwd(q_, k_, v_, causal=causal)[0]

    def int8_fused_step(q_, k_, v_):
        return int8_attention_fwd_fused(q_, k_, v_, causal=causal)[0].astype(q_.dtype)

    return sdpa_step, bf16_step, int8_step, int8_fused_step


def bench_shape(B, H, T, D, causal=True, accuracy=True):
    from quantizedattention_tpu.ops.flash_fwd import flash_attention_fwd
    from quantizedattention_tpu.ops.int8_fwd import int8_attention_fwd
    from quantizedattention_tpu.reference import reference_attention
    from quantizedattention_tpu.utils.testing import mismatch_report

    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (B, H, T, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, T, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, T, D), jnp.float32)
    q16, k16, v16 = (x.astype(jnp.bfloat16) for x in (q, k, v))

    sdpa_step, bf16_step, int8_step, int8_fused_step = make_steps(causal)
    t_sdpa = chained_time(sdpa_step, q16, k16, v16)
    t_bf16 = chained_time(bf16_step, q16, k16, v16)
    t_int8 = chained_time(int8_step, q, k, v)
    # inference-mode fused kernel: quantization in-kernel, no HBM residuals;
    # bf16 inputs (the serving dtype) — the best int8 forward on v5e
    t_int8f = chained_time(int8_fused_step, q16, k16, v16)

    flops = 2 * 2 * B * H * T * T * D * (0.5 if causal else 1.0)

    def tf(t):
        return flops / t / 1e12

    log(f"--- shape=({B},{H},{T},{D}) causal={causal} ---")
    log(f"SDPA bf16 (XLA anchor): {t_sdpa*1e3:8.3f} ms  {tf(t_sdpa):6.1f} TFLOP/s")
    log(f"bf16 corrected kernel : {t_bf16*1e3:8.3f} ms  {tf(t_bf16):6.1f} TFLOP/s  "
        f"{t_sdpa/t_bf16:.2f}x SDPA")
    log(f"int8 train (+quant)   : {t_int8*1e3:8.3f} ms  {tf(t_int8):6.1f} TFLOP/s  "
        f"{t_sdpa/t_int8:.2f}x SDPA")
    log(f"int8 fused (infer)    : {t_int8f*1e3:8.3f} ms  {tf(t_int8f):6.1f} TFLOP/s  "
        f"{t_sdpa/t_int8f:.2f}x SDPA  {t_bf16/t_int8f:.2f}x bf16-kernel")
    if _FETCH_FLOOR_S:
        d_sdpa, d_bf16, d_i8f = (_debias(t) for t in (t_sdpa, t_bf16, t_int8f))
        log(f"debiased (fetch-floor-corrected): SDPA {tf(d_sdpa):6.1f}, "
            f"bf16 {tf(d_bf16):6.1f}, int8-fused {tf(d_i8f):6.1f} TFLOP/s; "
            f"int8-fused {d_sdpa/d_i8f:.2f}x SDPA")

    ok = True
    if accuracy:
        from quantizedattention_tpu.ops.int8_fwd import int8_attention_fwd_fused

        want = reference_attention(q, k, v, causal=causal)
        rep_bf16 = mismatch_report(
            "bf16", flash_attention_fwd(q16, k16, v16, causal=causal)[0], want, atol=1e-2
        )
        rep_int8 = mismatch_report(
            "int8", int8_attention_fwd(q, k, v, causal=causal)[0], want, atol=5e-2
        )
        # the fused inference kernel feeds the headline timing, so its
        # accuracy is ALWAYS part of the claimability gate
        rep_f = mismatch_report(
            "int8-fused",
            int8_attention_fwd_fused(q, k, v, causal=causal)[0], want, atol=5e-2,
        )
        log(str(rep_bf16))
        log(str(rep_int8))
        log(str(rep_f))
        ok = (rep_bf16.mismatch_rate <= 5e-5
              and rep_int8.mismatch_rate <= 2e-3
              and rep_f.mismatch_rate <= 2e-3)
        if not ok:
            log("WARNING: accuracy outside envelope — speedup not claimable")
    # headline int8 time = the best ACCURACY-GUARDED int8 forward (the fused
    # inference kernel in practice; the training forward is stderr detail)
    return t_sdpa, t_bf16, min(t_int8, t_int8f), ok


def bench_gqa(B=4, H=16, HKV=4, T=4096, D=64):
    """GQA-native (unrepeated KV) vs repeat-at-boundary A/B (stderr detail).

    The GQA kernels stream K/V once per kv head and quantize per kv head
    (round-3 verdict next #2); the repeated path materializes a rep x K/V
    copy in HBM first. Rows: bf16 fwd, fused int8 fwd, bf16 fwd+bwd.
    """
    from quantizedattention_tpu.ops.api import flash_attention_bf16
    from quantizedattention_tpu.ops.flash_fwd import flash_attention_fwd
    from quantizedattention_tpu.ops.int8_fwd import int8_attention_fwd_fused

    rep = H // HKV
    kq, kk, kv, kd = jax.random.split(jax.random.key(5), 4)
    q = jax.random.normal(kq, (B, H, T, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, HKV, T, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, HKV, T, D), jnp.bfloat16)

    def gqa_step(q_, k_, v_):
        return flash_attention_fwd(q_, k_, v_, causal=True)[0].astype(q_.dtype)

    def rep_step(q_, k_, v_):
        kr = jnp.repeat(k_, rep, axis=1)
        vr = jnp.repeat(v_, rep, axis=1)
        return flash_attention_fwd(q_, kr, vr, causal=True)[0].astype(q_.dtype)

    def gqa_i8(q_, k_, v_):
        return int8_attention_fwd_fused(q_, k_, v_, causal=True)[0].astype(q_.dtype)

    def rep_i8(q_, k_, v_):
        kr = jnp.repeat(k_, rep, axis=1)
        vr = jnp.repeat(v_, rep, axis=1)
        return int8_attention_fwd_fused(q_, kr, vr, causal=True)[0].astype(q_.dtype)

    t_g = chained_time(gqa_step, q, k, v)
    t_r = chained_time(rep_step, q, k, v)
    t_gi = chained_time(gqa_i8, q, k, v)
    t_ri = chained_time(rep_i8, q, k, v)
    flops = 2 * 2 * B * H * T * T * D * 0.5

    log(f"--- GQA A/B shape=({B},{H}q/{HKV}kv,{T},{D}) causal (rep={rep}) ---")
    log(f"bf16 fwd  GQA-native : {t_g*1e3:8.3f} ms  {flops/t_g/1e12:6.1f} TFLOP/s")
    log(f"bf16 fwd  repeated KV: {t_r*1e3:8.3f} ms  {flops/t_r/1e12:6.1f} TFLOP/s"
        f"  (native {t_r/t_g:.2f}x)")
    log(f"int8 fwd  GQA-native : {t_gi*1e3:8.3f} ms  {flops/t_gi/1e12:6.1f} TFLOP/s")
    log(f"int8 fwd  repeated KV: {t_ri*1e3:8.3f} ms  {flops/t_ri/1e12:6.1f} TFLOP/s"
        f"  (native {t_ri/t_gi:.2f}x)")

    # fwd+bwd: GQA-native custom_vjp vs repeated-KV custom_vjp
    do = jax.random.normal(kd, (B, H, T, D), jnp.float32)

    def timed_grad(loss_fn, reps=5, n=32):
        grad = jax.grad(loss_fn, argnums=(0, 1, 2))

        @jax.jit
        def ch(a, k_, v_, do_):
            def body(i, acc):
                gq, gk, gv = grad(acc, k_, v_, do_)
                return acc + (1e-20 * (gq + gk.sum(1, keepdims=True)
                                       + gv.sum(1, keepdims=True))).astype(acc.dtype)
            return jnp.sum(jax.lax.fori_loop(0, n, body, a).astype(jnp.float32))

        float(ch(q, k, v, do))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(ch(q, k, v, do))
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2] / n

    t_tg = timed_grad(lambda a, b_, c_, d_: jnp.vdot(
        flash_attention_bf16(a, b_, c_, causal=True), d_))
    t_tr = timed_grad(lambda a, b_, c_, d_: jnp.vdot(
        flash_attention_bf16(a, jnp.repeat(b_, rep, 1), jnp.repeat(c_, rep, 1),
                             causal=True), d_))
    tflops = flops * 3.5
    log(f"bf16 f+b  GQA-native : {t_tg*1e3:8.3f} ms  {tflops/t_tg/1e12:6.1f} TFLOP/s")
    log(f"bf16 f+b  repeated KV: {t_tr*1e3:8.3f} ms  {tflops/t_tr/1e12:6.1f} TFLOP/s"
        f"  (native {t_tr/t_tg:.2f}x)")
    return t_g, t_r


def bench_train_step(B=4, H=16, T=2048, D=64):
    """fwd+bwd comparison at BASELINE config 2's shape (stderr detail)."""
    from quantizedattention_tpu.ops.api import flash_attention_bf16

    kq, kk, kv, kd = jax.random.split(jax.random.key(1), 4)
    q = jax.random.normal(kq, (B, H, T, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, T, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, T, D), jnp.bfloat16)
    do = jax.random.normal(kd, (B, H, T, D), jnp.float32)

    def timed(loss_fn, reps=5, n=32):
        grad = jax.grad(loss_fn, argnums=(0, 1, 2))

        @jax.jit  # k/v/do ride as ARGUMENTS (closure would bake them as constants)
        def ch(a, k_, v_, do_):
            def body(i, acc):
                gq, gk, gv = grad(acc, k_, v_, do_)
                return acc + (1e-20 * (gq + gk + gv)).astype(acc.dtype)
            return jnp.sum(jax.lax.fori_loop(0, n, body, a).astype(jnp.float32))

        float(ch(q, k, v, do))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(ch(q, k, v, do))
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2] / n

    sdpa_step, _, _, _ = make_steps(True)
    t_sdpa = timed(lambda a, b, c, d_: jnp.vdot(sdpa_step(a, b, c).astype(jnp.float32), d_))
    t_ours = timed(lambda a, b, c, d_: jnp.vdot(flash_attention_bf16(a, b, c, causal=True), d_))
    flops = 2 * 2 * B * H * T * T * D * 0.5 * 3.5
    log(f"--- train step (fwd+bwd) shape=({B},{H},{T},{D}) causal ---")
    log(f"XLA SDPA grad : {t_sdpa*1e3:8.3f} ms  {flops/t_sdpa/1e12:6.1f} TFLOP/s")
    log(f"bf16 kernel   : {t_ours*1e3:8.3f} ms  {flops/t_ours/1e12:6.1f} TFLOP/s  "
        f"{t_sdpa/t_ours:.2f}x SDPA")

    # int8 fwd+bwd (quantize-once residual reuse): the quantization passes
    # amortize over the whole step, where the backward reads 4x fewer
    # residual bytes — int8's honest training-side comparison vs bf16
    from quantizedattention_tpu.ops.api import sage_attention_int8

    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))

    def timed_f32(loss_fn, reps=5, n=32):
        grad = jax.grad(loss_fn, argnums=(0, 1, 2))

        @jax.jit
        def ch(a, k_, v_, do_):
            def body(i, acc):
                gq, gk, gv = grad(acc, k_, v_, do_)
                return acc + (1e-20 * (gq + gk + gv)).astype(acc.dtype)
            return jnp.sum(jax.lax.fori_loop(0, n, body, a).astype(jnp.float32))

        float(ch(qf, kf, vf, do))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(ch(qf, kf, vf, do))
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2] / n

    t_i8 = timed_f32(lambda a, b, c, d_: jnp.vdot(sage_attention_int8(a, b, c, causal=True), d_))
    log(f"int8 kernel   : {t_i8*1e3:8.3f} ms  {flops/t_i8/1e12:6.1f} TFLOP/s  "
        f"{t_sdpa/t_i8:.2f}x SDPA  {t_ours/t_i8:.2f}x bf16-kernel")
    return t_ours, t_i8


def bench_jvp(B=4, H=16, T=4096, D=64):
    """Fused (O, tO) JVP kernel + the transpose-path split (stderr detail).

    The reference's JVP kernel records no perf number (attention_jvp.py);
    this row makes regressions visible (round-1 verdict weak #8).
    """
    from quantizedattention_tpu.ops.api import attention_jvp, attention_value_and_jvp

    ks = jax.random.split(jax.random.key(3), 6)
    q, k, v, tq, tk, tv = (jax.random.normal(kk_, (B, H, T, D), jnp.float32) for kk_ in ks)

    def timed(fn, reps=5, n=32):
        @jax.jit
        def ch(a, *rest):
            def body(i, acc):
                o, to = fn(acc, *rest)
                return acc + 1e-20 * (o + to)
            return jnp.sum(jax.lax.fori_loop(0, n, body, a))

        float(ch(q, k, v, tq, tk, tv))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(ch(q, k, v, tq, tk, tv))
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2] / n

    t_pair = timed(lambda a, k_, v_, tq_, tk_, tv_: attention_value_and_jvp(
        a, k_, v_, tq_, tk_, tv_, causal=False))
    t_fast = timed(lambda a, k_, v_, tq_, tk_, tv_: attention_value_and_jvp(
        a, k_, v_, tq_, tk_, tv_, causal=False, fast=True))
    t_split = timed(lambda a, k_, v_, tq_, tk_, tv_: jax.jvp(
        lambda x, y, z: attention_jvp(x, y, z, causal=False),
        (a, k_, v_), (tq_, tk_, tv_)))
    base = 2 * 2 * B * H * T * T * D  # one fwd's matmul flops (non-causal)
    log(f"--- JVP (O, tO) shape=({B},{H},{T},{D}) non-causal ---")
    log(f"fused pair (exact) : {t_pair*1e3:8.3f} ms  {3*base/t_pair/1e12:6.1f} TFLOP/s")
    log(f"fused pair (fast)  : {t_fast*1e3:8.3f} ms  {3*base/t_fast/1e12:6.1f} TFLOP/s"
        f"  (bf16-rate dots; tO still 0 mismatches @ atol 1e-2)")
    log(f"fwd+tangent split  : {t_split*1e3:8.3f} ms  {3.5*base/t_split/1e12:6.1f} TFLOP/s")
    return t_fast


def _build_decode_arm(n_slots=8, ctx=1024, n_layers=4, weight_quant=None,
                      kv_quant=None, d_model=1024, n_heads=16, head_dim=64):
    """Build one serving-decode arm; returns measure() -> per-step seconds
    for ONE timed trial (one fetch of a 64-step chain). Arms are built once
    and measured in interleaved rounds (bench_decode_ab) because the relay's
    drift is TEMPORAL — back-to-back A/A/B/B lets a slow half-hour bias one
    arm; A/B/A/B does not.

    weight_quant: None (bf16 weights), "pallas" (int8 weights through the
    in-VMEM-dequant kernel, ops/int8_linear.py), "xla" (int8 weights
    dequantized by XLA), or "int4" (packed nibbles + group scales through
    ops/int4_linear.py) — decode is weight-HBM-bound.

    kv_quant: None (the default int8 KV cache) / "int4" (packed-nibble
    cache, parallel/kv4_cache.py) / "int8-aligned" (the int8 cache at the
    int4 arm's 256-aligned max_seq — the fair A/B base, since pack blocks
    force a slightly different cache geometry)."""
    from quantizedattention_tpu.models import (
        TransformerConfig, decode_step_batched, init_transformer, prefill_batched,
    )

    # modest vocab keeps the relay's compile-request body under its limit —
    # params must also ride as jit ARGUMENTS (closure capture would bake the
    # embed/unembed tables into the program as constants)
    cfg = TransformerConfig(
        vocab_size=8192, d_model=d_model, n_heads=n_heads, n_kv_heads=n_heads,
        head_dim=head_dim, n_layers=n_layers,
        max_seq=ctx + (256 if kv_quant else 128),
        attention="bf16",
    )
    from quantizedattention_tpu.parallel.kv4_cache import init_kv4_cache
    from quantizedattention_tpu.parallel.kv_cache import init_kv_cache

    params = init_transformer(jax.random.key(0), cfg)
    # serving weights in bf16 (decode is weight-HBM-bound: measured 1.5x)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    if weight_quant is not None:
        from quantizedattention_tpu.quantize import quantize_lm_weights

        if weight_quant == "int4":
            params = quantize_lm_weights(params, bits=4)
        else:
            params = quantize_lm_weights(params, via=weight_quant)
    mk = init_kv4_cache if kv_quant == "int4" else init_kv_cache
    caches = [mk(n_slots, cfg.n_kv_heads, cfg.max_seq, cfg.head_dim)
              for _ in params["layers"]]
    prompt = jax.random.randint(jax.random.key(2), (n_slots, ctx), 0, cfg.vocab_size)
    tok, caches = jax.jit(prefill_batched, static_argnames="cfg")(params, caches, prompt, cfg)

    import functools
    decode = jax.jit(functools.partial(decode_step_batched, cfg=cfg))
    active = jnp.ones((n_slots,), bool)
    n = 64

    @jax.jit
    def ch(params, t0, pos0, caches):
        def body(i, st):
            t, p, c = st
            t, c = decode(params, c, t, p, active)
            return (t, p + 1, c)
        t, p, c = jax.lax.fori_loop(0, n, body, (t0, pos0, caches))
        return jnp.sum(t)

    pos0 = jnp.full((n_slots,), ctx, jnp.int32)

    def measure():
        t0 = time.perf_counter()
        float(ch(params, tok, pos0, caches))
        return (time.perf_counter() - t0) / n

    return measure, cfg


def _median_spread(ts):
    """(median, relative spread) of a sample list; spread = (max-min)/med."""
    ts = sorted(ts)
    med = ts[len(ts) // 2]
    return med, (ts[-1] - ts[0]) / med if med else 0.0


def bench_decode(n_slots=8, ctx=1024, n_layers=4, weight_quant=None,
                 kv_quant=None, trials=5, **arm_kw):
    """Single-arm serving decode step rate (stderr detail) — the plain
    decode-NL rows. A/B comparisons go through bench_decode_ab instead."""
    from quantizedattention_tpu.tune.autotune import resolve_decode_block

    measure, cfg = _build_decode_arm(n_slots=n_slots, ctx=ctx,
                                     n_layers=n_layers,
                                     weight_quant=weight_quant,
                                     kv_quant=kv_quant, **arm_kw)
    measure()  # compile + warm
    per_step, spread = _median_spread([measure() for _ in range(trials)])
    blk = resolve_decode_block(cfg.max_seq, cfg.head_dim,
                               kind="decode4" if kv_quant == "int4" else "decode")
    wq = f", int8 weights ({weight_quant})" if weight_quant else ""
    if kv_quant:
        wq += f", kv cache {kv_quant} (max_seq {cfg.max_seq})"
    log(f"--- serving decode: {n_slots} slots, ctx {ctx}, "
        f"{n_layers}L/{cfg.d_model}d model{wq} ---")
    log(f"decode step: {per_step*1e3:7.3f} ms  ->  {n_slots/per_step:,.0f} tokens/s"
        f"  (spread ±{spread*50:.1f}%, decode block_kv={blk} requested — the "
        f"kernel rounds to the largest divisor of max_seq under its VMEM cap)")
    return per_step


def bench_decode_ab(arm_specs, trials=3, label=""):
    """Interleaved serving-step A/B (round-4 verdict #5): build every arm,
    then time them in A/B/A/B rounds and report median ± spread per arm and
    each ratio vs the FIRST arm, labeled 'within noise' when the delta is
    inside the combined measured spread. Single-shot two-decimal speedups
    through a ±10% relay flipped sign day-to-day (w8 1.12x->0.98x, prefix
    1.55x->0.99x); a claim here must clear its own error bar.

    arm_specs: list of (name, kwargs-for-_build_decode_arm); the first arm
    is the baseline. Returns {name: (median_s, spread)}."""
    arms = []
    for name, kw in arm_specs:
        try:
            m, _cfg = _build_decode_arm(**kw)
            m()  # compile + warm now, so round 1 isn't a compile for late arms
            arms.append((name, m))
        except Exception as e:  # noqa: BLE001 — one bad arm must not kill the A/B
            log(f"  arm {name} failed to build: {type(e).__name__}: {e}")
    samples = {name: [] for name, _ in arms}
    for _ in range(trials):
        for name, m in arms:  # temporal interleave
            samples[name].append(m())
    log(f"--- interleaved decode A/B{': ' + label if label else ''} "
        f"({trials} rounds) ---")
    stats = {}
    base = None
    for name, _m in arms:
        med, spread = _median_spread(samples[name])
        stats[name] = (med, spread)
        if base is None:
            base = (name, med, spread)
            log(f"  {name:24s} {med*1e3:8.3f} ms/step  ±{spread*50:4.1f}%  (baseline)")
        else:
            ratio = base[1] / med
            noise = (base[2] + spread) / 2
            tag = "WITHIN NOISE" if abs(ratio - 1.0) <= noise else (
                "faster" if ratio > 1 else "SLOWER")
            log(f"  {name:24s} {med*1e3:8.3f} ms/step  ±{spread*50:4.1f}%  "
                f"{ratio:5.2f}x vs {base[0]} [{tag}]")
    return stats


def bench_engine(n_slots=8, ctx=1024, horizon=32, n_tokens=96, n_layers=4,
                 adaptive=None):
    """Engine end-to-end tokens/s (host loop + scheduler + pipelined
    dispatch-before-fetch on every path) vs the raw device decode rate
    (stderr detail). adaptive: adaptive_horizon cap for the A/B row."""
    from quantizedattention_tpu.models import TransformerConfig, init_transformer
    from quantizedattention_tpu.serve import ServingEngine

    cfg = TransformerConfig(
        vocab_size=8192, d_model=1024, n_heads=16, n_kv_heads=16, head_dim=64,
        n_layers=n_layers, max_seq=ctx + 256, attention="bf16",
    )
    params = init_transformer(jax.random.key(0), cfg)
    eng = ServingEngine(params, cfg, n_slots=n_slots, scheduler="native",
                        param_dtype=jnp.bfloat16, decode_horizon=horizon,
                        adaptive_horizon=adaptive)
    import numpy as _np

    rng = _np.random.default_rng(0)
    prompts = [list(rng.integers(1, cfg.vocab_size, size=ctx // 4)) for _ in range(n_slots)]
    for p in prompts:  # warmup run compiles prefill + every horizon bank
        eng.submit(p, n_tokens)  # same budget as the timed run: the
        # adaptive engine picks the same bucket sequence, so all bank
        # sizes compile here, not inside the measurement
    eng.run()
    for p in prompts:
        eng.submit(p, n_tokens)
    t0 = time.perf_counter()
    res = eng.run()
    dt = time.perf_counter() - t0
    total = sum(len(r.tokens) for r in res.values())
    log(f"--- engine end-to-end: {n_slots} slots, ctx {ctx//4} prompt, "
        f"horizon {horizon}, {n_layers}L model (pipelined) ---")
    log(f"{total} tokens in {dt:.3f}s -> {total/dt:,.0f} tokens/s "
        f"(incl. prefills + host scheduling through the relay)")
    led = eng.ledger()
    if led.get("wall_s"):
        # host-time decomposition (round-4 verdict #6): where the wall
        # clock beyond pure device stepping actually goes
        log(f"ledger: {led['dispatches']} dispatches ({led['dispatch_s']:.3f}s) "
            f"+ {led['fetches']} fetch batches ({led['fetch_s']:.3f}s) "
            f"+ host/sched {led['other_host_s']:.3f}s = {led['wall_s']:.3f}s "
            f"for {led['tokens']} tokens "
            f"({led['fetch_s']/max(led['fetches'],1)*1e3:.1f} ms/fetch)")
    return total / dt


def bench_spec_decode(n_slots=8, ctx=256, n_tokens=96, n_layers=4, k=4,
                      horizon=32):
    """Speculative-decoding A/B: the same slots and prompts served by the
    engine's best plain config (pipelined horizon banks) vs spec_decode=k
    (host n-gram prompt-lookup drafts + the staircase verify kernel,
    serve/spec.py). Greedy and token-exact by construction, so the only
    question is throughput; the win rides the acceptance rate (tokens
    banked per model pass, reported) — repetitive generations accept a
    lot, incompressible ones fall back to ~1 token/pass. Prompts here are
    periodic motifs (the workload spec decode exists for)."""
    from quantizedattention_tpu.models import TransformerConfig, init_transformer
    from quantizedattention_tpu.serve import ServingEngine

    cfg = TransformerConfig(
        vocab_size=8192, d_model=1024, n_heads=16, n_kv_heads=16, head_dim=64,
        n_layers=n_layers, max_seq=-(-(ctx + 256) // 128) * 128,
        attention="bf16",
    )
    params = init_transformer(jax.random.key(0), cfg)
    prompts = [
        (list(range(100 + 16 * i, 116 + 16 * i)) * (ctx // 16 + 1))[:ctx]
        for i in range(n_slots)
    ]

    def run(**kw):
        eng = ServingEngine(params, cfg, n_slots=n_slots, scheduler="native",
                            param_dtype=jnp.bfloat16, **kw)
        for p in prompts:  # warmup compiles prefill + decode variants
            eng.submit(p, n_tokens)
        eng.run()
        for p in prompts:
            eng.submit(p, n_tokens)
        t0 = time.perf_counter()
        res = eng.run()
        dt = time.perf_counter() - t0
        total = sum(len(r.tokens) for r in res.values())
        return total, dt, eng

    tot_a, dt_a, _ = run(decode_horizon=horizon)
    tot_b, dt_b, eng_b = run(spec_decode=k)
    sp = eng_b.stats()["spec"]
    log(f"--- speculative decode A/B: {n_slots} slots, ctx {ctx} periodic "
        f"prompt, {n_layers}L model ---")
    log(f"plain (horizon {horizon}): {tot_a} tokens in {dt_a:.3f}s -> "
        f"{tot_a/dt_a:,.0f} tokens/s")
    log(f"spec  (k={k}):            {tot_b} tokens in {dt_b:.3f}s -> "
        f"{tot_b/dt_b:,.0f} tokens/s  "
        f"({sp['tokens_per_pass']:.2f} tokens/model-pass, "
        f"{sp['accepted']} drafts accepted)")
    log(f"spec-decode speedup: {(tot_b/dt_b)/(tot_a/dt_a):.2f}x")
    return tot_b / dt_b


def bench_prefix_cache(n_slots=8, shared=768, tail=64, n_tokens=32,
                       n_layers=4):
    """Automatic-prefix-caching A/B (paged engine): a wave of requests that
    share a long prompt prefix, served cold (full prefills) vs warm (tail
    prefills reading the cached prefix pages). The win is skipped prefill
    compute + skipped prefill dispatches; tokens are exact either way
    (tests/test_prefix_cache.py)."""
    from quantizedattention_tpu.models import TransformerConfig, init_transformer
    from quantizedattention_tpu.serve import ServingEngine
    import numpy as _np

    ctx = shared + tail
    cfg = TransformerConfig(
        vocab_size=8192, d_model=1024, n_heads=16, n_kv_heads=16, head_dim=64,
        n_layers=n_layers, max_seq=ctx + 256, attention="bf16",
    )
    params = init_transformer(jax.random.key(0), cfg)
    rng = _np.random.default_rng(0)
    prefix = list(rng.integers(1, cfg.vocab_size, size=shared))

    def waves():
        # two waves with the same shared prefix, distinct tails: wave 1
        # seeds (or, cold, just runs); wave 2 is the measured one
        return [
            [prefix + list(rng.integers(1, cfg.vocab_size, size=tail))
             for _ in range(n_slots)]
            for _ in range(2)
        ]

    def run_engine(prefix_cache):
        eng = ServingEngine(
            params, cfg, n_slots=n_slots, scheduler="native",
            param_dtype=jnp.bfloat16, cache="paged", page_size=128,
            prefill_chunk=256, decode_horizon=n_tokens,
            prefix_cache=prefix_cache,
        )
        w1, w2 = waves()
        for p in w1:  # compile + (warm) seed the store
            eng.submit(p, n_tokens)
        eng.run()
        # wave 2 is the measured one; per-request TTFT from the engine's
        # own GenerationResult.ttft_s (round-4 verdict #6: what prefix
        # caching actually buys is skipped prefill BEFORE the first token —
        # invisible in whole-run tokens/s through a ~26 ms-RTT relay at 32
        # new tokens)
        rids = [eng.submit(p, n_tokens) for p in w2]
        t0 = time.perf_counter()
        res = eng.run()
        dt = time.perf_counter() - t0
        total = sum(len(r.tokens) for r in res.values())
        ttfts = sorted(res[r].ttft_s for r in rids)
        ttft_med = ttfts[len(ttfts) // 2] if ttfts else float("nan")
        return total / dt, ttft_med, eng.stats()

    cold_tps, cold_ttft, _ = run_engine(False)
    warm_tps, warm_ttft, s = run_engine(True)
    log(f"--- prefix-cache A/B: {n_slots} slots x ({shared} shared + {tail} "
        f"tail) prompt, {n_tokens} new tokens, {n_layers}L ---")
    log(f"cold {cold_tps:,.0f} tok/s  ->  warm {warm_tps:,.0f} tok/s "
        f"({warm_tps/cold_tps:.2f}x; hit pages {s.get('prefix_hit_pages', 0)}, "
        f"miss pages {s.get('prefix_miss_pages', 0)})")
    log(f"TTFT (median over wave-2 requests): cold {cold_ttft*1e3:,.1f} ms"
        f"  ->  warm {warm_ttft*1e3:,.1f} ms  ({cold_ttft/warm_ttft:.2f}x"
        f" faster to first token)")
    return warm_tps / cold_tps


def _section(name, fn, *args, **kwargs):
    """Run one NON-headline bench section; a failure (transient relay flap,
    OOM at an exotic shape) logs and moves on instead of killing the whole
    capture — BENCH_r03 was lost to an all-or-nothing run. The headline
    section and its accuracy gates are NOT routed through this.

    Backend-death recovery (round-4 verdict #2): BENCH_r04 lost 8 tail
    sections to ONE mid-run relay death — each section failed in sequence
    with FAILED_PRECONDITION and nothing ever re-probed the backend. When a
    section fails with a backend-death-class error, re-run the bounded
    probe (which waits out a re-warming relay) and retry the section once;
    later sections then meet a live backend instead of a corpse."""
    try:
        return fn(*args, **kwargs)
    except Exception as e:  # noqa: BLE001 — deliberate capture-resilience
        log(f"SECTION FAILED ({name}): {type(e).__name__}: {e}")
        dead = any(tag in f"{type(e).__name__}: {e}" for tag in (
            "FAILED_PRECONDITION", "UNAVAILABLE", "DEADLINE_EXCEEDED",
            "INTERNAL", "Socket closed", "connection",
        ))
        if not dead:
            return None
        log(f"({name}) backend-death class error -> re-probing backend")
        if not probe_backend():
            log(f"({name}) backend did not come back; continuing (later "
                f"sections will re-probe on their own failures)")
            return None
        log(f"({name}) backend back up; retrying section once")
        try:
            return fn(*args, **kwargs)
        except Exception as e2:  # noqa: BLE001
            log(f"SECTION FAILED on retry ({name}): {type(e2).__name__}: {e2}")
            return None


def main():
    if not probe_backend():
        log("FATAL: no device backend reachable after bounded probes")
        print(json.dumps({
            "metric": "int8_attention_speedup_vs_bf16_sdpa_seq4096",
            "value": 0.0, "unit": "x", "vs_baseline": 0.0,
            "error": "backend unreachable (probe timed out)",
        }))
        sys.exit(1)

    _section("fetch-floor", measure_fetch_floor)

    # BASELINE config 3's long-sequence regime — the HEADLINE — runs FIRST:
    # if the relay flaps mid-run, the claimable number is already banked.
    t_sdpa, t_bf16, t_int8, ok = bench_shape(4, 16, 4096, 64, causal=True)
    speedup = t_sdpa / t_int8 if ok else 0.0
    headline = json.dumps({
        "metric": "int8_attention_speedup_vs_bf16_sdpa_seq4096",
        "value": round(speedup, 4),
        "unit": "x",
        "vs_baseline": round(speedup / 2.0, 4),
    })
    # emit the claimable line NOW (flushed): the remaining ~20 sections pay
    # many cold relay compiles, and a timeout mid-run must not cost the
    # already-measured headline (BENCH_r03 died to exactly this class)
    print(headline, flush=True)

    # the reference's canonical shape (detail; its own headline was 0.90x)
    _section("ref-shape", bench_shape, 8, 35, 1024, 64, causal=True)
    # head_dim 128 (BASELINE config 2 names d=64/128; full MXU contraction
    # depth — expect well above the d=64 ceiling)
    _section("d128-1k", bench_shape, 8, 16, 1024, 128, causal=True)
    _section("d128-4k", bench_shape, 4, 8, 4096, 128, causal=True)
    # GQA A/B: unrepeated-KV kernels vs the repeat-at-boundary path
    _section("gqa", bench_gqa)
    # train-step A/Bs: seq 2048 (BASELINE config 2) plus the long-sequence
    # rows where int8's 4x-smaller residual reads should actually show
    # (round-3 verdict next #5)
    _section("train-2k", bench_train_step)
    _section("train-4k", bench_train_step, T=4096)
    _section("train-8k", bench_train_step, B=2, H=8, T=8192)
    _section("train-d128", bench_train_step, B=2, H=8, T=4096, D=128)
    _section("jvp", bench_jvp)
    per_step_4 = _section("decode-4L", bench_decode)
    # weight-only quant A/B at d1024 — INTERLEAVED (round-4 verdict #5: the
    # single-shot ratios here flipped sign across days, 1.12x -> 0.98x)
    _section("w-quant-1024d", bench_decode_ab, [
        ("bf16", {}),
        ("w8-pallas", {"weight_quant": "pallas"}),
        ("w8-xla", {"weight_quant": "xla"}),
        ("w4", {"weight_quant": "int4"}),
    ], label="weights @ d_model 1024 / 4L (~50 MB bf16 — NOT weight-bound)")
    # ... and in the TARGET regime (round-4 verdict #4): d_model 4096 / 4L
    # is ~1.6 GB of bf16 weights -> decode genuinely weight-HBM-bound; this
    # is where ops/int8_linear.py's k-block streaming should finally matter
    d4096 = dict(d_model=4096, n_heads=32, head_dim=128, ctx=512, n_slots=8)
    _section("w-quant-4096d", bench_decode_ab, [
        ("bf16", dict(d4096)),
        ("w8-pallas", dict(d4096, weight_quant="pallas")),
        ("w8-xla", dict(d4096, weight_quant="xla")),
        ("w4", dict(d4096, weight_quant="int4")),
    ], label="weights @ d_model 4096 / 4L (~1.6 GB bf16 — weight-bound)")
    # int4 KV cache A/B, interleaved, same 256-aligned geometry both arms.
    # History: the round-4 token-order-concat kernel LOST at ctx 4096
    # (0.71x, docs/BENCH_RECAPTURE_2026-08-19.log:77-82 — the refuted
    # "crossover" prediction); the round-5 kernel runs two dots per nibble
    # half in byte-row order (parallel/kv4_cache.py). These rows are the
    # regression guard on that fix at both the short- and long-context ends.
    _section("kv4-ab-1k", bench_decode_ab, [
        ("kv8-aligned", {"kv_quant": "int8-aligned"}),
        ("kv4", {"kv_quant": "int4"}),
    ], label="int4 KV @ ctx 1024 (kernel ~40% of step)")
    _section("kv4-ab-4k", bench_decode_ab, [
        ("kv8-aligned", {"ctx": 4096, "kv_quant": "int8-aligned"}),
        ("kv4", {"ctx": 4096, "kv_quant": "int4"}),
    ], label="int4 KV @ ctx 4096 (KV bytes dominate)")
    _section("engine-4L", bench_engine)
    _section("engine-spec", bench_spec_decode)
    # deeper model: a 12-layer profile where per-layer cache traffic and
    # host-loop overheads scale differently (round-2 verdict weak #3)
    per_step_12 = _section("decode-12L", bench_decode, n_layers=12)
    eng_12 = _section("engine-12L", bench_engine, n_layers=12)
    # adaptive bank sizing A/B (round-4 verdict #6): fewer dispatch+fetch
    # cycles for the same token budget when the queue is empty
    _section("engine-12L-adaptive", bench_engine, n_layers=12, adaptive=128)
    # automatic prefix caching: shared-prefix wave, cold vs warm
    _section("prefix-cache", bench_prefix_cache)
    if per_step_12 and eng_12:
        log(f"engine-12L vs device-12L step rate: "
            f"{eng_12 / (8 / per_step_12) * 100:.0f}% of device rate")
    # BASELINE config 3's upper bound (detail; the SDPA anchor collapses to
    # ~0.3 TFLOP/s materializing 8192^2 scores while the kernels hold
    # ~30-38 TFLOP/s -> ~100x; the headline stays at 4096 where the anchor
    # is still a meaningful comparison)
    _section("seq8192", bench_shape, 2, 8, 8192, 64, causal=True)
    log("headline (already printed on stdout): " + headline)


if __name__ == "__main__":
    main()
    # Force a clean rc=0 exit once the results are printed: the relay
    # client's teardown can linger for minutes after main() returns
    # (measured ~4 min on 2026-08-18), which would eat the driver's
    # timeout-bounded capture the way the round-3 init hang did.
    sys.stdout.flush()
    sys.stderr.flush()
    import os

    os._exit(0)
