"""Forward-mode (JVP) attention vs jax.jvp of the fp32 oracle.

The reference's machine-checked oracle test (torch.func.jvp,
attention_jvp.py:254-258) recorded 0/18,350,080 mismatches at atol 1e-2 for
both O and tO (attention_jvp.py:305-317) — we assert the same zero-mismatch
envelope.
"""

import jax
import jax.numpy as jnp
import pytest

from quantizedattention_tpu import attention_jvp, attention_jvp_fwd
from quantizedattention_tpu.reference import reference_attention_jvp
from quantizedattention_tpu.utils.testing import mismatch_report
from tests.conftest import make_qkv


@pytest.mark.parametrize("causal", [False, True])
def test_jvp_kernel_vs_oracle(rng, causal):
    q, k, v, _ = make_qkv(rng, batch=1, head=2, q_tokens=256)
    k1, k2, k3 = jax.random.split(jax.random.key(3), 3)
    tq = jax.random.normal(k1, q.shape)
    tk = jax.random.normal(k2, k.shape)
    tv = jax.random.normal(k3, v.shape)

    o, to, lse, _mu = attention_jvp_fwd(q, k, v, tq, tk, tv, causal=causal)
    o_w, to_w = reference_attention_jvp((q, k, v), (tq, tk, tv), causal=causal)

    rep_o = mismatch_report("jvp O", o, o_w, atol=1e-2)
    rep_to = mismatch_report("jvp tO", to, to_w, atol=1e-2)
    assert rep_o.mismatches == 0, rep_o
    assert rep_to.mismatches == 0, rep_to


def test_jvp_api_under_jax_jvp(rng):
    """attention_jvp must slot into jax.jvp as a custom_jvp primitive."""
    q, k, v, _ = make_qkv(rng, batch=1, head=1, q_tokens=128)
    tq, tk, tv = jnp.ones_like(q), jnp.ones_like(k), jnp.ones_like(v)
    o, to = jax.jvp(lambda a, b, c: attention_jvp(a, b, c), (q, k, v), (tq, tk, tv))
    o_w, to_w = reference_attention_jvp((q, k, v), (tq, tk, tv))
    assert mismatch_report("api O", o, o_w, atol=1e-2).mismatches == 0
    assert mismatch_report("api tO", to, to_w, atol=1e-2).mismatches == 0


def test_jvp_ones_tangents_canonical(rng):
    """The reference's exact test setup: all-ones tangents
    (attention_jvp.py:242-245)."""
    q, k, v, _ = make_qkv(rng, batch=2, head=2, q_tokens=256)
    tq, tk, tv = jnp.ones_like(q), jnp.ones_like(k), jnp.ones_like(v)
    o, to, _, _ = attention_jvp_fwd(q, k, v, tq, tk, tv)
    o_w, to_w = reference_attention_jvp((q, k, v), (tq, tk, tv))
    assert mismatch_report("O", o, o_w, atol=1e-2).mismatches == 0
    assert mismatch_report("tO", to, to_w, atol=1e-2).mismatches == 0
