"""Where does decode-kernel time go? Fixed-cost curve over context.

The round-5 kv4 A/B (experiments/kv4_ab.py) measured int8 decode at
528 us (ctx 1024) vs 601 us (ctx 4096) — 3.4x the KV bytes for +14% time,
i.e. a ~500 us per-call component dominates and the kernel runs at ~15%
of HBM peak. This sweeps context and block size to locate the fixed cost
before optimizing the wrong thing.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from quantizedattention_tpu.parallel.kv_cache import (
    append_kv, decode_attention, init_kv_cache,
)
from quantizedattention_tpu.utils.profiling import chained_seconds

B, H, D = 8, 16, 64


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    for max_len, blocks in [(256, (256,)), (1024, (256, 512, 1024)),
                            (4096, (256, 512, 1024)),
                            (8192, (512, 1024))]:
        ctx = max_len
        k = jax.random.normal(jax.random.key(0), (B, H, ctx, D), jnp.float32)
        v = jax.random.normal(jax.random.key(1), (B, H, ctx, D), jnp.float32)
        c8 = init_kv_cache(B, H, max_len, D)
        c8 = append_kv(c8, k, v)
        q = jax.random.normal(jax.random.key(2), (B, H, D), jnp.float32)
        kv_mb = 2 * B * H * max_len * D / 1e6
        for blk in blocks:
            if max_len % blk:
                continue
            t = chained_seconds(
                lambda qq, c: decode_attention(qq, c, block_kv=blk), q, c8)
            cells = B * (max_len // blk)
            print(f"max_len {max_len:5d} blk {blk:5d} ({cells:4d} cells): "
                  f"{t*1e6:8.1f} us  {kv_mb/t/1e3:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
