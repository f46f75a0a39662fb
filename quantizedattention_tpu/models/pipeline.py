"""Pipeline-parallel training step (GPipe-style microbatching over `pipe`).

Beyond-reference capability (SURVEY.md §2.4 lists PP as absent upstream;
the other axes — dp/tp/sp — live in models/sharded_train.py). Design:

  * The transformer's blocks are STACKED into one pytree with a leading
    layer axis and sharded P('pipe') on that axis — each of the S stages
    owns L/S contiguous blocks and runs them with a lax.scan.
  * Embedding / unembedding are replicated and run outside the pipeline
    (they are cheap; the pipeline carries only the d_model-wide activation
    stream).
  * The classic GPipe schedule: the batch splits into M microbatches; over
    T = M + S - 1 ticks, stage s processes microbatch t - s while
    jax.lax.ppermute shifts activations stage -> stage+1 each tick. The
    whole schedule is one lax.fori_loop inside shard_map, so XLA overlaps
    the ppermute hop with the next tick's compute.
  * Differentiability is free: ppermute's transpose is the reverse
    ppermute, scan/fori transpose handles the schedule, so jax.grad of the
    pipelined loss IS pipeline-parallel backward (activations are
    rematerialized per-stage by jax.checkpoint on the block stack to keep
    the live set at one activation per in-flight microbatch).

The attention inside each block is the corrected-bf16 flash kernel, causal,
so this composes kernel + pipeline. Composing pipe x (data, context) is the
usual mesh product; this module keeps the demonstration to the pipe axis
plus data-parallel microbatching.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quantizedattention_tpu.models.transformer import (
    TransformerConfig,
    _block,
    init_transformer,
)


def stack_layers(params):
    """[{layer0}, {layer1}, ...] -> one pytree with a leading layer axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params["layers"])


def pipeline_param_specs(cfg: TransformerConfig):
    """PartitionSpecs: stacked blocks sharded on 'pipe' (leading axis),
    embed/unembed/final_norm replicated."""
    layer = {k: P("pipe") for k in (
        "ln1", "wq", "wk", "wv", "wo", "ln2", "w1", "w2",
    )}
    return {
        "embed": P(),
        "unembed": P(),
        "final_norm": P(),
        "layers": layer,
    }


def _stage_fn(stacked_local, x, cfg: TransformerConfig, positions):
    """Run this stage's L/S blocks over activation x via scan."""

    def body(h, layer):
        return _block(layer, h, cfg, positions), None

    # remat each block: keeps one live activation per in-flight microbatch
    h, _ = jax.lax.scan(jax.checkpoint(body), x, stacked_local)
    return h


def make_pipeline_train_step(
    mesh: Mesh,
    cfg: TransformerConfig,
    n_microbatches: int,
    optimizer=None,
):
    """Returns (optimizer, step, prepare) for GPipe training over the mesh's
    `pipe` axis.

    step: (params, opt_state, tokens, targets) -> (params, opt_state, loss)
    where params came from `prepare(init_transformer(...))` — blocks stacked
    and device_put to the pipe sharding. tokens/targets: [B, T] with B a
    multiple of n_microbatches.
    """
    import optax

    if optimizer is None:
        optimizer = optax.adamw(3e-4)
    n_stages = mesh.shape["pipe"]
    if cfg.n_layers % n_stages != 0:
        raise ValueError(f"n_layers={cfg.n_layers} must divide into {n_stages} stages")

    specs = pipeline_param_specs(cfg)

    def prepare(params):
        stacked = {
            "embed": params["embed"],
            "unembed": params["unembed"],
            "final_norm": params["final_norm"],
            "layers": stack_layers(params),
        }
        shardings = jax.tree_util.tree_map(
            lambda spec: NamedSharding(mesh, spec), specs,
            is_leaf=lambda x: isinstance(x, P),
        )
        return jax.device_put(stacked, shardings)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(specs, P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def pipelined_loss(params, tokens, targets):
        from quantizedattention_tpu.models.transformer import rmsnorm

        stage = jax.lax.axis_index("pipe")
        n_micro = n_microbatches
        b, t = tokens.shape
        mb = b // n_micro
        positions = jnp.arange(t)

        # every stage embeds all microbatches (replicated, cheap) — only the
        # stream through the blocks is pipelined
        x_all = params["embed"][tokens].reshape(n_micro, mb, t, -1)

        fwd = functools.partial(_stage_fn, params["layers"], cfg=cfg, positions=positions)
        perm_fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        d_model = x_all.shape[-1]
        out_all = jnp.zeros_like(x_all)
        carry_in = jnp.zeros((mb, t, d_model), x_all.dtype)

        def tick(t_idx, state):
            carry_in, out_all = state
            mb_idx = t_idx - stage  # which microbatch this stage works on
            # stage 0 injects fresh microbatches from x_all; others take the
            # ppermuted activation from stage-1
            inject = jnp.clip(t_idx, 0, n_micro - 1)
            x_in = jnp.where(stage == 0, x_all[inject], carry_in)
            live = (mb_idx >= 0) & (mb_idx < n_micro)
            y = fwd(x=x_in)
            y = jnp.where(live, y, x_in)
            # last stage banks its finished microbatch
            bank = jnp.clip(mb_idx, 0, n_micro - 1)
            out_all = jnp.where(
                (stage == n_stages - 1) & live,
                out_all.at[bank].set(y),
                out_all,
            )
            carry_next = jax.lax.ppermute(y, "pipe", perm_fwd)
            return carry_next, out_all

        carry_in, out_all = jax.lax.fori_loop(
            0, n_micro + n_stages - 1, tick, (carry_in, out_all)
        )

        # only the last stage's bank is real; broadcast it to all stages
        if n_stages > 1:
            out_all = jax.lax.all_gather(out_all, "pipe")[n_stages - 1]

        x = out_all.reshape(b, t, -1)
        x = rmsnorm(x, params["final_norm"])
        logits = x @ params["unembed"]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    @jax.jit
    def step(params, opt_state, tokens, targets):
        loss, grads = jax.value_and_grad(pipelined_loss)(params, tokens, targets)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return optimizer, step, prepare
