"""Cross-check the jnp oracle and the kernels against the C++ f64 oracle.

The C++ oracle shares nothing with XLA, so agreement here rules out an
XLA-level miscompile cancelling out between kernel and jnp oracle.
"""

import numpy as np
import pytest

from quantizedattention_tpu.reference import reference_attention, reference_attention_vjp
from tests.conftest import make_qkv

native = pytest.importorskip("quantizedattention_tpu.reference.native_oracle")

try:
    native._load()
    HAVE_CXX = True
except Exception:  # no g++ in env
    HAVE_CXX = False

pytestmark = pytest.mark.skipif(not HAVE_CXX, reason="g++ unavailable")


@pytest.mark.parametrize("causal", [False, True])
def test_jnp_oracle_matches_native(rng, causal):
    q, k, v, _ = make_qkv(rng, batch=1, head=2, q_tokens=96, kv_tokens=64)
    want = native.native_attention_fwd(np.asarray(q), np.asarray(k), np.asarray(v), causal=causal)
    got = np.asarray(reference_attention(q, k, v, causal=causal))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_jnp_vjp_matches_native(rng, causal):
    q, k, v, do = make_qkv(rng, batch=1, head=2, q_tokens=64)
    want = native.native_attention_bwd(
        np.asarray(q), np.asarray(k), np.asarray(v), np.asarray(do), causal=causal
    )
    got = reference_attention_vjp(q, k, v, do, causal=causal)
    for g, w, nm in zip(got, want, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-5, err_msg=nm)


def test_kernel_matches_native_directly(rng):
    """The Pallas fp32 kernel against the C++ oracle with no jnp middleman."""
    from quantizedattention_tpu.ops.flash_fwd import flash_attention_fwd

    q, k, v, _ = make_qkv(rng, batch=1, head=1, q_tokens=256)
    o, _ = flash_attention_fwd(q, k, v, causal=True, precision="fp32")
    want = native.native_attention_fwd(np.asarray(q), np.asarray(k), np.asarray(v), causal=True)
    np.testing.assert_allclose(np.asarray(o), want, atol=5e-5)
