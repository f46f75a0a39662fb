"""Round-4 verdict item #4: where does the headline shape's MFU go?

BENCH_r02 measured the bf16 forward at (4,16,4096,64) causal at 40.3
counted TFLOP/s against the repo's ~51 TFLOP/s d=64 attention ceiling
(~79%), while (2,8,8192,64) reaches 48.7 (~95%). This experiment separates
two candidate explanations:

  (a) the kernel's instantaneous MXU rate is lower at this shape
      (pipeline fill/drain over 4 q-blocks, write traffic, re-DMA), or
  (b) the *counted* flops (the 0.5 causal factor in
      utils/profiling.attention_flops) under-count what the kernel
      actually computes: with block_q=1024 and 1024-wide kv compute
      subtiles at seq 4096, causal skipping runs at subtile granularity —
      the kernel computes sum_{i=1..4} i = 10 of 16 subtiles (fraction
      0.625, the 4 diagonal subtiles half-masked) while the flop count
      assumes 0.5. Counted 40.3 / (0.625/0.5) = instantaneous ~50.4
      = the ceiling. At seq 8192 / block 1024 the fraction is 36/64 =
      0.5625 — a smaller distortion, matching the higher counted number.

Method: time the NON-CAUSAL forward at the same shape (computed fraction
exactly 1.0) to get the instantaneous rate, compare t_causal/t_full to the
predicted computed fraction, and sweep (block_q, kv_compute) causal to see
whether any granularity beats the pinned config. Reference anchor: the
recorded-config discipline of /root/reference/attention_bf16.py:728-764.

Run on the real TPU: python experiments/mfu_gap.py
Results are recorded in docs/ARCHITECTURE.md §4.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from quantizedattention_tpu.ops.flash_fwd import flash_attention_fwd
from quantizedattention_tpu.tune.config import BlockConfig
from quantizedattention_tpu.utils.profiling import attention_flops, chained_seconds


def computed_fraction(t: int, block_q: int, gran: int) -> float:
    """Fraction of the full score matrix the kernel actually computes under
    causal skipping at `gran`-wide kv subtiles (diagonal subtiles count
    fully — they are computed, then masked)."""
    n_q = t // block_q
    total = 0
    for i in range(n_q):
        hi = (i + 1) * block_q  # rows of this q block see kv < hi
        total += -(-hi // gran) * gran * block_q  # ceil to subtile
    return total / (t * t)


def bench(shape, causal, cfg, n_chain=64):
    b, h, t, d = shape
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, t, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, t, d), jnp.bfloat16)

    def step(q_, k_, v_):
        return flash_attention_fwd(q_, k_, v_, causal=causal, config=cfg)[0].astype(q_.dtype)

    sec = chained_seconds(step, q, k, v, n_chain=n_chain)
    counted = attention_flops(b, h, t, t, d, causal) / sec / 1e12
    return sec, counted


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    shape = (4, 16, 4096, 64)
    b, h, t, d = shape

    pinned = BlockConfig(block_q=1024, block_kv=8192, block_q_bwd=1024,
                         block_kv_bwd=1024, block_kv_compute=1024).clamp(t, t)

    # 1) instantaneous rate: non-causal forward, computed fraction 1.0
    sec_f, rate_full = bench(shape, causal=False, cfg=pinned)
    print(f"non-causal: {sec_f*1e3:8.3f} ms  instantaneous {rate_full:6.1f} TFLOP/s",
          flush=True)

    # 2) causal at the pinned config: is t_causal/t_full == computed fraction?
    sec_c, counted = bench(shape, causal=True, cfg=pinned)
    frac_pred = computed_fraction(t, pinned.block_q, pinned.kv_compute)
    print(f"causal    : {sec_c*1e3:8.3f} ms  counted {counted:6.1f} TFLOP/s  "
          f"t_c/t_f={sec_c/sec_f:.3f}  predicted computed fraction={frac_pred:.3f}  "
          f"implied instantaneous {counted*frac_pred/0.5:6.1f} TFLOP/s", flush=True)

    # 3) granularity sweep: can any (block_q, kv_compute) point do better?
    print("--- causal sweep (block_q x kv_compute; DMA block_kv=4096) ---", flush=True)
    best = (sec_c, "pinned")
    for bq in (512, 1024, 2048):
        for sub in (512, 1024, 2048, 4096):
            if sub > 4096 or 4096 % sub:
                continue
            cfg = BlockConfig(block_q=bq, block_kv=4096, block_q_bwd=1024,
                              block_kv_bwd=1024,
                              block_kv_compute=0 if sub == 4096 else sub)
            try:
                sec, cnt = bench(shape, causal=True, cfg=cfg, n_chain=32)
            except Exception as e:  # vmem overflow etc.
                print(f"bq={bq:5d} sub={sub:5d}: FAILED {type(e).__name__}", flush=True)
                continue
            fr = computed_fraction(t, bq, sub)
            print(f"bq={bq:5d} sub={sub:5d}: {sec*1e3:8.3f} ms  counted {cnt:6.1f}"
                  f"  frac={fr:.3f}  instantaneous {cnt*fr/0.5:6.1f}", flush=True)
            if sec < best[0]:
                best = (sec, f"bq={bq},sub={sub}")
    print(f"best causal: {best[1]} at {best[0]*1e3:.3f} ms", flush=True)

    # 4) the same decomposition at the other benched shapes, for the record
    for shp in ((2, 8, 8192, 64), (4, 8, 4096, 128)):
        b2, h2, t2, d2 = shp
        cfg = BlockConfig(block_q=1024, block_kv=8192, block_q_bwd=1024,
                          block_kv_bwd=1024, block_kv_compute=1024).clamp(t2, t2)
        sf, rf = bench(shp, causal=False, cfg=cfg, n_chain=32)
        sc, cc = bench(shp, causal=True, cfg=cfg, n_chain=32)
        fr = computed_fraction(t2, cfg.block_q, cfg.kv_compute)
        print(f"{shp}: full {sf*1e3:.3f} ms ({rf:.1f}); causal {sc*1e3:.3f} ms "
              f"(counted {cc:.1f}, frac={fr:.3f}, instantaneous {cc*fr/0.5:.1f})",
              flush=True)


if __name__ == "__main__":
    main()
