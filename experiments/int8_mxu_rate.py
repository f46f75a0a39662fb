"""Settle the int8-vs-bf16 MXU rate record (round-4 verdict #8a).

Round 2 measured int8x int8->int32 at the SAME rate as bf16 (M=N=2048,
K in {64, 256, 1024}); a later microbenchmark recorded ~0.7x at contraction
depth 512 (ops/int8_fwd.py header). Both used chained_seconds at n_chain=64,
which carries a ~0.4-0.5 ms additive fetch bias (experiments/call_floor.py)
— possibly enough to blur the ratio at small K. This run uses SLOPE timing
(fetch-free) across shapes and is the record of note; the design conclusion
(run int8 payloads as exact bf16) survives either outcome because bf16 is
never SLOWER and needs no int32->f32 epilogue.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from quantizedattention_tpu.utils.profiling import chained_slope_seconds


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    m = n = 4096
    for k in (64, 256, 512, 1024, 4096):
        flops = 2.0 * m * n * k
        a8 = jnp.ones((m, k), jnp.int8)
        b8 = jnp.ones((k, n), jnp.int8)
        ab = jnp.ones((m, k), jnp.bfloat16)
        bb = jnp.ones((k, n), jnp.bfloat16)

        # the feedback must consume EVERY output column or XLA narrows the
        # dot to the sliced columns and the flops accounting lies (the
        # first version of this experiment measured an impossible 2x-peak
        # that way): block-sum o over n down to [m, k] — O(m*n) VPU work,
        # negligible against the O(m*n*k) matmul
        def int8_chain(a, b):
            o = jax.lax.dot(a, b, preferred_element_type=jnp.int32)
            f = o.reshape(m, n // k, k).sum(axis=1) if k <= n else o[:, :k]
            return (f % 127).astype(jnp.int8)

        def bf16_chain(a, b):
            o = jax.lax.dot(a, b, preferred_element_type=jnp.float32)
            f = o.reshape(m, n // k, k).sum(axis=1) if k <= n else o[:, :k]
            return f.astype(jnp.bfloat16) * jnp.bfloat16(1e-3)

        t8 = chained_slope_seconds(int8_chain, a8, b8, n_lo=16, n_hi=64)
        tb = chained_slope_seconds(bf16_chain, ab, bb, n_lo=16, n_hi=64)
        print(f"K={k:5d}: int8 {flops/t8/1e12:7.1f} TOP/s   "
              f"bf16 {flops/tb/1e12:7.1f} TFLOP/s   int8/bf16 {tb/t8:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
