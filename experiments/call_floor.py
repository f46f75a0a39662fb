"""What costs ~500 us per decode_attention call, independent of size?

experiments/decode_overhead.py measured a ~500 us per-call floor (max_len
256: 515 us for 4 MB of KV). Suspects: (a) the chained-fori harness itself,
(b) any pallas_call on this stack, (c) the decode kernel's grid/scalar-
prefetch structure, (d) the XLA glue in the wrapper. Time each in the same
chained harness.
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from quantizedattention_tpu.utils.profiling import chained_seconds


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    x = jnp.ones((8, 16, 64), jnp.float32)
    w = jnp.ones((64, 64), jnp.float32)

    # (a) pure jnp elementwise
    t = chained_seconds(lambda q, ww: q + 1.0, x, w)
    print(f"jnp add          : {t*1e6:8.1f} us", flush=True)

    # (a2) small matmul
    t = chained_seconds(lambda q, ww: jnp.einsum("bhd,de->bhe", q, ww), x, w)
    print(f"jnp matmul 64x64 : {t*1e6:8.1f} us", flush=True)

    # (b) trivial pallas kernel, 1 cell
    def k1(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    def pallas_one(q, ww):
        return pl.pallas_call(
            k1, out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        )(q)

    t = chained_seconds(pallas_one, x, w)
    print(f"pallas 1-cell    : {t*1e6:8.1f} us", flush=True)

    # (b2) trivial pallas kernel, 8-cell grid over batch
    def k2(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    def pallas_grid(q, ww):
        return pl.pallas_call(
            k2,
            grid=(8,),
            in_specs=[pl.BlockSpec((1, 16, 64), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, 16, 64), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        )(q)

    t = chained_seconds(pallas_grid, x, w)
    print(f"pallas 8-cell    : {t*1e6:8.1f} us", flush=True)

    # (c) the real decode kernel at minimum size
    from quantizedattention_tpu.parallel.kv_cache import (
        append_kv, decode_attention, init_kv_cache,
    )
    c8 = init_kv_cache(8, 16, 256, 64)
    c8 = append_kv(
        c8,
        jnp.ones((8, 16, 256, 64), jnp.float32),
        jnp.ones((8, 16, 256, 64), jnp.float32),
    )
    t = chained_seconds(
        lambda q, c: decode_attention(q, c, block_kv=256), x, c8)
    print(f"decode max_len256: {t*1e6:8.1f} us", flush=True)

    # (d) same but 64 chained non-pallas attention (XLA path) for contrast
    k_full = jnp.ones((8, 16, 256, 64), jnp.float32)

    def xla_attn(q, kf):
        s = jnp.einsum("bhd,bhtd->bht", q, kf) * 0.125
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bht,bhtd->bhd", p, kf)

    t = chained_seconds(xla_attn, x, k_full)
    print(f"xla decode attn  : {t*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
