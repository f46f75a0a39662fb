"""Kernel-level int4-vs-int8 KV decode A/B at long context — DEBIASED.

Round-5 history:
- ctx-4096 committed negative: int4 0.71x vs int8 step-level with the
  round-4 token-order-concat kernel (docs/BENCH_RECAPTURE_2026-08-19.log).
- two-dot byte-row kernel (parallel/kv4_cache.py): a single-shot step A/B
  first read 0.93x (fetch-bias artifact); the interleaved BENCH_r05 step
  A/B reads 0.73x. This experiment measures the KERNEL alone, debiased.
- experiments/call_floor.py exposed a ~0.5 ms ADDITIVE bias in
  chained_seconds at n_chain=64 (the ~30 ms fetch RTT / 64 — even a
  chained `jnp add` "costs" 476 us). All timing here is therefore
  SLOPE-based (chained_slope_seconds): the marginal cost per chained
  iteration, fetch-RTT-free.
- compares the two in-kernel unpack routes (kv4_cache._UNPACK_MODE):
  int32-shift vs all-bf16 arithmetic.

Run on the real TPU:  python experiments/kv4_ab.py [ctx ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")  # NOT via PYTHONPATH — that breaks the
                                  # axon plugin's backend discovery

import jax
import jax.numpy as jnp

from quantizedattention_tpu.parallel import kv4_cache
from quantizedattention_tpu.parallel.kv4_cache import (
    decode_attention_int4, init_kv4_cache, install_kv4_batched,
)
from quantizedattention_tpu.parallel.kv_cache import (
    append_kv, decode_attention, init_kv_cache,
)
from quantizedattention_tpu.utils.profiling import chained_slope_seconds

B, H, D = 8, 16, 64


def build(ctx):
    max_len = ((ctx // 256) + 1) * 256  # same 256-aligned geometry both arms
    k = jax.random.normal(jax.random.key(0), (B, H, ctx, D), jnp.float32)
    v = jax.random.normal(jax.random.key(1), (B, H, ctx, D), jnp.float32)
    c8 = init_kv_cache(B, H, max_len, D)
    c8 = append_kv(c8, k, v)
    c4 = init_kv4_cache(B, H, max_len, D)
    c4 = install_kv4_batched(c4, k, v)
    c4 = c4._replace(length=jnp.full((B,), ctx, jnp.int32))
    q = jax.random.normal(jax.random.key(2), (B, H, D), jnp.float32)
    return q, c8, c4, max_len


def main():
    ctxs = [int(a) for a in sys.argv[1:]] or [1024, 4096, 8192]
    print(f"devices: {jax.devices()}", file=sys.stderr)
    for ctx in ctxs:
        q, c8, c4, max_len = build(ctx)
        kv_bytes8 = 2 * B * H * max_len * D  # K+V int8 payload bytes
        # one block request; both wrappers round to a valid divisor/cap
        blk = 1024
        print(f"ctx {ctx} (max_len {max_len}):", flush=True)
        t8 = chained_slope_seconds(
            lambda qq, c: decode_attention(qq, c, block_kv=blk), q, c8)
        print(f"  int8       : {t8*1e6:8.1f} us  "
              f"({kv_bytes8/t8/1e9:6.1f} GB/s)", flush=True)
        for mode in ("shift", "float"):
            kv4_cache._UNPACK_MODE = mode
            # the jit cache does not key on module globals: clear it so the
            # mode actually re-traces
            kv4_cache._decode_attention_int4.clear_cache()
            try:
                t4 = chained_slope_seconds(
                    lambda qq, c: decode_attention_int4(qq, c, block_kv=blk),
                    q, c4)
            except Exception as e:  # noqa: BLE001 — report and keep going
                print(f"  int4 {mode:6s}: FAILED {type(e).__name__}", flush=True)
                continue
            bw4 = (kv_bytes8 / 2) / t4 / 1e9
            print(f"  int4 {mode:6s}: {t4*1e6:8.1f} us  ({bw4:6.1f} GB/s)  "
                  f"speedup vs int8 {t8/t4:.3f}x", flush=True)


if __name__ == "__main__":
    main()
    time.sleep(0)
