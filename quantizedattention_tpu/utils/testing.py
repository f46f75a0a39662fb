"""Structured accuracy reports: mismatch counts + MSE + max-abs-err.

The reference prints `isclose(atol=1e-2, rtol=0)` mismatch counts and MSE but
never asserts (reference: attention_bf16.py:613-696, commented-out asserts at
698-725). We keep the same metrics — they are the published accuracy envelope
(BASELINE.md) — but return them as a dataclass so tests can assert tiered
tolerances per dtype.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass
class MismatchReport:
    name: str
    mismatches: int
    total: int
    mse: float
    max_abs_err: float
    atol: float

    @property
    def mismatch_rate(self) -> float:
        return self.mismatches / max(self.total, 1)

    def __str__(self) -> str:
        return (
            f"{self.name}: {self.mismatches}/{self.total} mismatches "
            f"(atol={self.atol}, rate={self.mismatch_rate:.2e}), "
            f"mse={self.mse:.4e}, max_abs_err={self.max_abs_err:.4e}"
        )


def mismatch_report(name: str, got, want, atol: float = 1e-2) -> MismatchReport:
    """Element-wise |got - want| <= atol (rtol=0) count, MSE, and max-abs-err."""
    got = jnp.asarray(got, jnp.float32)
    want = jnp.asarray(want, jnp.float32)
    err = jnp.abs(got - want)
    return MismatchReport(
        name=name,
        mismatches=int(jnp.sum(err > atol)),
        total=int(err.size),
        mse=float(jnp.mean(err * err)),
        max_abs_err=float(jnp.max(err)),
        atol=atol,
    )
