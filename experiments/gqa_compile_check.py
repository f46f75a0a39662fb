"""Compile-only check that the GQA-native kernels fit scoped VMEM on real
Mosaic lowering at the bench A/B shape (4,16q/4kv,4096,64).

The round-4 bench exposed a real-lowering-only failure interpret mode cannot
catch (CLAUDE.md): the unrolled q-group loop keeps rep live
[block_q, kv_compute] logits/P tiles on the scoped-vmem stack — 19.28 MB at
rep=4 x 1024 x 1024, over the 16 MB limit. BlockConfig.clamp_rep now bounds
rep*block_q*kv_compute (fwd) and rep*block_q_bwd*block_kv_bwd (bwd); this
script AOT-compiles fwd, fused int8 fwd, and the custom_vjp backward at the
failing shape to prove the budgets fit. Chipless (compile helper only).

Run: python experiments/gqa_compile_check.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from quantizedattention_tpu.ops.api import flash_attention_bf16, sage_attention_int8
from quantizedattention_tpu.ops.flash_fwd import flash_attention_fwd
from quantizedattention_tpu.ops.int8_fwd import int8_attention_fwd_fused

B, H, HKV, T, D = 4, 16, 4, 4096, 64


def main():
    kq, kk, kv = jax.random.split(jax.random.key(5), 3)
    q = jax.random.normal(kq, (B, H, T, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, HKV, T, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, HKV, T, D), jnp.bfloat16)

    def fwd(q_, k_, v_):
        return flash_attention_fwd(q_, k_, v_, causal=True)[0]

    def i8(q_, k_, v_):
        return int8_attention_fwd_fused(q_, k_, v_, causal=True)[0]

    def loss_bf16(q_, k_, v_):
        return jnp.sum(flash_attention_bf16(q_, k_, v_, causal=True).astype(jnp.float32))

    def loss_i8(q_, k_, v_):
        return jnp.sum(sage_attention_int8(
            q_.astype(jnp.float32), k_.astype(jnp.float32), v_.astype(jnp.float32),
            causal=True))

    for name, fn in (
        ("gqa fwd bf16", fwd),
        ("gqa fwd int8-fused", i8),
        ("gqa fwd+bwd bf16", jax.grad(loss_bf16, argnums=(0, 1, 2))),
        ("gqa fwd+bwd int8", jax.grad(loss_i8, argnums=(0, 1, 2))),
    ):
        try:
            jax.jit(fn).lower(q, k, v).compile()
            print(f"{name:22s}: COMPILED", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            print(f"{name:22s}: FAILED {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
