"""Checkpoint/resume for model params and optimizer state.

The reference persists nothing (SURVEY.md §5); production training needs
durable params. Two backends behind one (path, tree) API:

  * Orbax (preferred): handles sharded arrays — each leaf is written from /
    restored to its jax.sharding, so a dp x tp x sp train state checkpoints
    and resumes WITHOUT gathering to one host (`like`'s shardings are the
    restore layout). This is the multi-host path.
  * numpy fallback: plain savez for minimal environments (no orbax);
    single-host only.

`load_checkpoint` auto-detects the on-disk format, so either backend can
read its own writes after an environment change.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

try:
    import orbax.checkpoint as _ocp
except ImportError:  # pragma: no cover - orbax is in the standard image
    _ocp = None


def _is_numpy_dir(path: str) -> bool:
    return os.path.exists(os.path.join(path, "leaves.npz"))


def _is_orbax_dir(path: str) -> bool:
    """Positive detection of the Orbax on-disk layout (metadata/manifest
    markers), so a foreign or partially written directory raises a clear
    'not a checkpoint' error instead of a confusing Orbax restore failure."""
    if not os.path.isdir(path):
        return False
    markers = ("_CHECKPOINT_METADATA", "_METADATA", "manifest.ocdbt")
    return any(os.path.exists(os.path.join(path, m)) for m in markers)


def save_checkpoint(path: str, tree, backend: str = "auto") -> None:
    """Save a pytree of (possibly sharded) arrays to `path` (directory).

    backend: "auto" (orbax when importable), "orbax", or "numpy".
    """
    if backend not in ("auto", "orbax", "numpy"):
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    use_orbax = _ocp is not None if backend == "auto" else backend == "orbax"
    if use_orbax:
        if _ocp is None:
            raise RuntimeError("orbax backend requested but orbax is not importable")
        path = os.path.abspath(path)
        ckptr = _ocp.StandardCheckpointer()
        ckptr.save(path, tree, force=True)
        ckptr.wait_until_finished()
        return
    os.makedirs(path, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(os.path.join(path, "leaves.npz"),
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})
    with open(os.path.join(path, "treedef.json"), "w") as f:
        json.dump({"treedef": str(treedef), "n": len(leaves)}, f)


def load_checkpoint(path: str, like):
    """Load a pytree saved by save_checkpoint, shaped (and SHARDED) like
    `like`: every restored leaf lands on `like`'s sharding, so a pod-sharded
    train state restores shard-by-shard with no host gather. `like` may hold
    real arrays or jax.ShapeDtypeStruct(shape, dtype, sharding=...)."""
    # leaves.npz wins: a numpy checkpoint stays loadable even if the
    # directory also contains Orbax-looking entries
    if _is_numpy_dir(path):
        pass
    elif _is_orbax_dir(path):
        if _ocp is None:
            raise RuntimeError(f"{path} is an orbax checkpoint but orbax is not importable")

        def abstract(x):
            if isinstance(x, jax.ShapeDtypeStruct):
                return x
            sharding = getattr(x, "sharding", None)
            return jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=sharding)

        ckptr = _ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), jax.tree_util.tree_map(abstract, like))
    if not _is_numpy_dir(path):
        raise ValueError(
            f"{path} is not a checkpoint directory (neither Orbax metadata "
            "nor leaves.npz found)"
        )
    data = np.load(os.path.join(path, "leaves.npz"))
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    loaded = [data[f"leaf_{i}"] for i in range(n)]
    for got, want in zip(loaded, leaves_like):
        if got.shape != np.shape(want):
            raise ValueError(f"checkpoint leaf shape {got.shape} != expected {np.shape(want)}")
    return jax.tree_util.tree_unflatten(treedef, [jax.numpy.asarray(x) for x in loaded])
