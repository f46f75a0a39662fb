"""Pipeline-parallel training step (GPipe-style microbatching over `pipe`).

Beyond-reference capability (SURVEY.md §2.4 lists PP as absent upstream;
the other axes — dp/tp/sp — live in models/sharded_train.py). Design:

  * The transformer's blocks are STACKED into one pytree with a leading
    layer axis and sharded P('pipe') on that axis — each of the S stages
    owns L/S contiguous blocks and runs them with a lax.scan.
  * Embedding / unembedding weights are replicated, but the WORK is not:
    stage 0 embeds one microbatch per tick as it injects it, and the last
    stage unembeds + accumulates the scalar loss per microbatch in-loop —
    no [n_micro, b, t, d] activation bank and no full-batch epilogue.
  * The classic GPipe schedule: the batch splits into M microbatches; over
    T = M + S - 1 ticks, stage s processes microbatch t - s while
    jax.lax.ppermute shifts activations stage -> stage+1 each tick. The
    whole schedule is one lax.fori_loop inside shard_map, so XLA overlaps
    the ppermute hop with the next tick's compute. Fill/drain bubbles
    (ticks where a stage has no live microbatch) skip the block stack via
    lax.cond instead of computing into a discarded jnp.where.
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
        d_model = params["embed"].shape[1]

        toks_mb = tokens.reshape(n_micro, mb, t)
        tgts_mb = targets.reshape(n_micro, mb, t)

        fwd = functools.partial(_stage_fn, params["layers"], cfg=cfg, positions=positions)
        perm_fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        carry_in = jnp.zeros((mb, t, d_model), params["embed"].dtype)
        loss_sum = jnp.zeros((), jnp.float32)

        def tick(t_idx, state):
            carry_in, loss_sum = state
            mb_idx = t_idx - stage  # which microbatch this stage works on
            live = (mb_idx >= 0) & (mb_idx < n_micro)
            inject = jnp.clip(t_idx, 0, n_micro - 1)
            # stage 0 embeds ONLY the microbatch it injects this tick (no
            # [n_micro, mb, t, d] bank materialized anywhere); other stages
            # take the ppermuted activation from stage-1
            x_in = jax.lax.cond(
                (stage == 0) & live,
                lambda c: params["embed"][toks_mb[inject]],
                lambda c: c,
                carry_in,
            )
            # dead ticks (the S-1 pipeline-fill/drain bubbles per stage)
            # skip the block stack entirely instead of computing and
            # discarding it — lax.cond executes one branch per device
            y = jax.lax.cond(live, fwd, lambda x: x, x_in)
            # the last stage consumes its finished microbatch IN-LOOP:
            # unembed + nll on [mb, t] only, accumulated into a scalar — no
            # full-batch output bank, no epilogue all_gather, and the
            # unembed matmul runs once per microbatch on one stage instead
            # of once per full batch on every stage
            def bank_loss(ls):
                h = rmsnorm(y, params["final_norm"])
                logits = h @ params["unembed"]
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                tg = tgts_mb[jnp.clip(mb_idx, 0, n_micro - 1)]
                nll = -jnp.take_along_axis(logp, tg[..., None], axis=-1)[..., 0]
                return ls + jnp.sum(nll)

            loss_sum = jax.lax.cond(
                (stage == n_stages - 1) & live, bank_loss, lambda ls: ls, loss_sum
            )
            carry_next = jax.lax.ppermute(y, "pipe", perm_fwd)
            return carry_next, loss_sum

        carry_in, loss_sum = jax.lax.fori_loop(
            0, n_micro + n_stages - 1, tick, (carry_in, loss_sum)
        )
        # only the last stage accumulated; psum replicates the total (and
        # its transpose seeds each device's cotangent exactly once, so
        # embed/unembed grads come out unscaled — each is touched by ONE
        # stage's compute path)
        total = jax.lax.psum(loss_sum, "pipe")
        return total / (b * t)

    @jax.jit
    def step(params, opt_state, tokens, targets):
        loss, grads = jax.value_and_grad(pipelined_loss)(params, tokens, targets)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return optimizer, step, prepare
