"""Aux subsystem tests: profiling harness, checkpointing, autotune cache."""

import os

from tests.conftest import make_qkv

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedattention_tpu.utils import (
    attention_flops,
    chained_seconds,
    load_checkpoint,
    save_checkpoint,
)


def test_attention_flops():
    assert attention_flops(1, 1, 128, 128, 64, causal=False) == 2 * 2 * 128 * 128 * 64
    assert attention_flops(1, 1, 128, 128, 64, causal=True) == 2 * 128 * 128 * 64


def test_chained_seconds_runs():
    x = jnp.ones((128, 128))
    t = chained_seconds(lambda a: a @ x, x, n_chain=2, reps=2)
    assert t > 0


def test_checkpoint_roundtrip(tmp_path, rng):
    from quantizedattention_tpu.models import TransformerConfig, init_transformer

    cfg = TransformerConfig(vocab_size=32, d_model=64, n_heads=1, n_kv_heads=1,
                            head_dim=64, n_layers=1, max_seq=64)
    params = init_transformer(rng, cfg)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params)
    like = init_transformer(jax.random.key(9), cfg)  # different values, same shapes
    restored = load_checkpoint(path, like)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_mismatch(tmp_path, rng):
    save_checkpoint(str(tmp_path / "c"), {"w": jnp.ones((4, 4))})
    with pytest.raises(ValueError):
        load_checkpoint(str(tmp_path / "c"), {"w": jnp.ones((8, 8))})


def test_autotune_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("QATTN_TUNE_CACHE", str(tmp_path / "tune.json"))
    from quantizedattention_tpu.tune import BlockConfig, load_cached_config, save_config

    cfg = BlockConfig(block_q=512, block_kv=256)
    save_config("bf16", (1, 2, 256, 64), cfg)
    got = load_cached_config("bf16", (1, 2, 256, 64))
    assert got == cfg
    assert load_cached_config("bf16", (9, 9, 9, 9)) is None


def test_autotune_sweep_picks_a_config(tmp_path, monkeypatch, rng):
    """End-to-end sweep over the real bf16 kernel at a tiny shape: must pick
    a valid candidate, persist it, and serve it from cache on re-entry."""
    monkeypatch.setenv("QATTN_TUNE_CACHE", str(tmp_path / "tune.json"))
    from quantizedattention_tpu.ops.flash_fwd import flash_attention_fwd
    from quantizedattention_tpu.tune.autotune import autotune

    q, k, v, _ = make_qkv(rng, batch=1, head=1, q_tokens=256)

    def make_fn(cfg):
        def fn(q_, k_, v_):
            return flash_attention_fwd(q_, k_, v_, causal=True, config=cfg)

        return fn

    best, t = autotune("bf16", make_fn, (q, k, v), 256, 256,
                       block_candidates=(128, 256), iters=2)
    assert best.block_q in (128, 256) and best.block_kv in (128, 256)
    assert t is not None and t > 0
    cached, t2 = autotune("bf16", make_fn, (q, k, v), 256, 256)
    assert cached == best and t2 is None  # served from the persisted cache
