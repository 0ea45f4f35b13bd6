"""Checkpoint / resume for scenes and training state.

The reference persists only via Unity asset serialization (SURVEY.md §5:
ScriptableObjects + scene YAML; no runtime checkpointing). The gradient
workload needs real save/restore: scene geometry + learnable materials +
optimizer state, as an orbax checkpoint (async-capable, sharding-aware)
with a plain-msgpack fallback for environments without orbax.
"""

from __future__ import annotations

import os
import pathlib

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str | os.PathLike, tree, force: bool = True):
    """Save an arbitrary pytree (scene, params, opt state...) to ``path``."""
    path = pathlib.Path(path).absolute()
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, _to_numpy_tree(tree), force=force)
        ckptr.wait_until_finished()
        return "orbax"
    except ModuleNotFoundError:
        import pickle

        path.mkdir(parents=True, exist_ok=True)
        leaves, treedef = jax.tree.flatten(_to_numpy_tree(tree))
        with open(path / "fallback.pkl", "wb") as f:
            pickle.dump((leaves, treedef), f)
        return "pickle"


def restore_checkpoint(path: str | os.PathLike, example_tree):
    """Restore into the structure/dtypes of ``example_tree``."""
    path = pathlib.Path(path).absolute()
    if (path / "fallback.pkl").exists():
        import pickle

        with open(path / "fallback.pkl", "rb") as f:
            leaves, treedef = pickle.load(f)
        return jax.tree.unflatten(treedef, leaves)

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, _to_numpy_tree(example_tree))
