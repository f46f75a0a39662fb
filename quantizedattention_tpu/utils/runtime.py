"""Small runtime helpers shared across kernels and tests."""

from __future__ import annotations

import jax


def use_interpret_mode() -> bool:
    """True when Pallas kernels should run interpreted (no TPU backend).

    CPU CI and the multi-chip dry-run use XLA's host platform, where Mosaic
    can't compile; interpret mode evaluates the same kernel body with jnp ops
    (BASELINE.json config 1 requires a CPU-runnable case).
    """
    return jax.default_backend() != "tpu"


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
