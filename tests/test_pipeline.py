"""GPipe pipeline-parallel train step on a 4-stage emulated mesh.

Correctness anchor: the pipelined loss must equal the single-device lm_loss
on identical params/tokens (same blocks, same math, just scheduled across
stages), and a train step must reduce it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedattention_tpu.models import (
    TransformerConfig,
    init_transformer,
    lm_loss,
    make_pipeline_train_step,
)


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 emulated devices")
    cfg = TransformerConfig(
        vocab_size=64, d_model=64, n_heads=2, n_kv_heads=2, head_dim=32,
        n_layers=4, max_seq=128, attention="bf16",
    )
    params = init_transformer(jax.random.key(0), cfg)
    mesh = jax.make_mesh((4,), ("pipe",))
    tokens = jax.random.randint(jax.random.key(1), (8, 128), 0, cfg.vocab_size)
    targets = jnp.roll(tokens, -1, axis=1)
    return cfg, params, mesh, tokens, targets


def test_pipeline_loss_matches_single_device(setup):
    cfg, params, mesh, tokens, targets = setup
    opt, step, prepare = make_pipeline_train_step(mesh, cfg, n_microbatches=4)
    pparams = prepare(params)
    opt_state = opt.init(pparams)
    _, _, loss = step(pparams, opt_state, tokens, targets)
    want = lm_loss(params, tokens, targets, cfg)
    np.testing.assert_allclose(float(loss), float(want), rtol=2e-4)


def test_pipeline_training_reduces_loss(setup):
    cfg, params, mesh, tokens, targets = setup
    opt, step, prepare = make_pipeline_train_step(mesh, cfg, n_microbatches=4)
    pparams = prepare(params)
    opt_state = opt.init(pparams)
    losses = []
    for _ in range(4):
        pparams, opt_state, loss = step(pparams, opt_state, tokens, targets)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_pipeline_rejects_bad_stage_split(setup):
    cfg, params, mesh, tokens, targets = setup
    bad = TransformerConfig(
        vocab_size=64, d_model=64, n_heads=2, n_kv_heads=2, head_dim=32,
        n_layers=3, max_seq=128,
    )
    with pytest.raises(ValueError, match="stages"):
        make_pipeline_train_step(mesh, bad, n_microbatches=4)
