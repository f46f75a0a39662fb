"""Aux subsystem tests: profiling harness, checkpointing, autotune cache."""

import os

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
