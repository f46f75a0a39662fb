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


def test_pipeline_grads_match_single_device(setup):
    """Gradient parity, not just loss parity: jax.grad of the pipelined
    loss (cond-guarded bubbles, per-tick embedding, in-loop last-stage
    loss) must match jax.grad of the single-device lm_loss — in particular
    the replicated embed/unembed grads must come out UNSCALED by the stage
    count (each is touched by exactly one stage's compute path)."""
    cfg, params, mesh, tokens, targets = setup
    from quantizedattention_tpu.models.pipeline import stack_layers

    opt, step, prepare = make_pipeline_train_step(mesh, cfg, n_microbatches=4)
    pparams = prepare(params)
    # reach the raw loss through one value_and_grad of the same step fn the
    # public API uses: re-derive grads by finite parity against lm_loss grads
    grads_want = jax.grad(
        lambda p: lm_loss(p, tokens, targets, cfg)
    )(params)
    want_stacked = {
        "embed": grads_want["embed"],
        "unembed": grads_want["unembed"],
        "final_norm": grads_want["final_norm"],
        "layers": stack_layers(grads_want),
    }

    import optax

    sgd = optax.sgd(1.0)  # update == -grad, so params_before - params_after == grad
    opt2, step2, prepare2 = make_pipeline_train_step(
        mesh, cfg, n_microbatches=4, optimizer=sgd
    )
    new_params, _, _ = step2(pparams, sgd.init(pparams), tokens, targets)
    got = jax.tree_util.tree_map(lambda a, b: a - b, pparams, new_params)
    flat_got = jax.tree_util.tree_leaves(got)
    flat_want = jax.tree_util.tree_leaves(want_stacked)
    assert len(flat_got) == len(flat_want)
    for g, w in zip(flat_got, flat_want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-3, rtol=0
        )


def test_pipeline_rejects_bad_stage_split(setup):
    cfg, params, mesh, tokens, targets = setup
    bad = TransformerConfig(
        vocab_size=64, d_model=64, n_heads=2, n_kv_heads=2, head_dim=32,
        n_layers=3, max_seq=128,
    )
    with pytest.raises(ValueError, match="stages"):
        make_pipeline_train_step(mesh, bad, n_microbatches=4)
