"""Test environment: CPU backend with 8 emulated devices.

Kernels run in Pallas interpret mode (auto-detected off-TPU), so the whole
suite is CPU-runnable CI (BASELINE.json config 1); the distributed tests use
the 8 emulated host devices as an ICI-mesh stand-in.

Note: this environment's sitecustomize imports jax and registers a TPU
platform plugin at interpreter start, so env vars alone are too late — we
force the platform via jax.config before any backend initializes. Setting
QATTN_TEST_TPU=1 runs the suite on the real TPU instead.
"""

import os

if os.environ.get("QATTN_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.key(42)


def make_qkv(rng, batch=1, head=2, q_tokens=256, kv_tokens=None, head_dim=64, dtype=jnp.float32):
    kv_tokens = q_tokens if kv_tokens is None else kv_tokens
    kq, kk, kv, kd = jax.random.split(rng, 4)
    q = jax.random.normal(kq, (batch, head, q_tokens, head_dim), dtype)
    k = jax.random.normal(kk, (batch, head, kv_tokens, head_dim), dtype)
    v = jax.random.normal(kv, (batch, head, kv_tokens, head_dim), dtype)
    do = jax.random.normal(kd, (batch, head, q_tokens, head_dim), dtype)
    return q, k, v, do
