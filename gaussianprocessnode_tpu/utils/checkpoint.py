"""Checkpoint / resume of training state (SURVEY.md §5).

The reference saves posteriors/θ/metrics ad-hoc as JLD files
(e.g. regression_kin40k.ipynb cell 15, savefiles/*.jld). Here any pytree of
arrays (θ, natural parameters of q(v), q(w), optimizer state) round-trips
through a single ``.npz`` file — no external deps, deterministic resume.
"""

import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree"]


def save_pytree(path: str, tree: Any) -> None:
    """Save a pytree of arrays/scalars to ``path`` (.npz + structure json)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
             **arrays)


def load_pytree(path: str, like: Any) -> Any:
    """Load a checkpoint saved with :func:`save_pytree`. ``like`` provides the
    pytree structure (e.g. a freshly-initialized state of the same shape).

    The structure stored at save time is validated against ``like``'s: a
    mismatch raises instead of silently mis-assigning leaves to the wrong
    positions (the treedef string is the only stable serialization jax
    offers, so comparison is textual)."""
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    stored_treedef = bytes(data["__treedef__"]).decode()
    if stored_treedef != str(treedef):
        raise ValueError(
            "checkpoint pytree structure does not match `like`:\n"
            f"  stored: {stored_treedef}\n"
            f"  like:   {treedef}"
        )
    leaves = [data[f"leaf_{i}"] for i in range(len(leaves_like))]
    import jax.numpy as jnp

    leaves = [jnp.asarray(x) for x in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)
