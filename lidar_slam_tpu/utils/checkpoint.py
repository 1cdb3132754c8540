"""SLAM-state checkpointing.

The reference keeps all state in RAM for the whole run and persists nothing
(SURVEY.md §5 — poses, clouds, SC database and factor graph all die with the
process). Here the entire SLAM state is one pytree of arrays, so
checkpoint/resume is a flat npz dump — enabling crash recovery and offline
inspection of every subsystem (poses, factors, keyframe DB, occupancy).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    items = {}
    for path, leaf in flat:
        key = "/".join(
            p.name if hasattr(p, "name") else str(getattr(p, "idx", p))
            for p in path
        )
        items[key] = np.asarray(leaf)
    return items, treedef


def save_state(path: str, state, extra: dict | None = None) -> None:
    """Write a SlamState (or any pytree of arrays) to ``path`` (.npz)."""
    items, _ = _flatten_with_paths(state)
    if extra:
        for k, v in extra.items():
            items[f"__extra__/{k}"] = np.asarray(v)
    np.savez_compressed(path, **items)


def load_state(path: str, template):
    """Load a checkpoint into the structure of ``template`` (shapes/dtypes
    must match — i.e. the same SlamConfig). Returns (state, extra_dict)."""
    data = np.load(path)
    items, treedef = _flatten_with_paths(template)
    leaves = []
    for key, tmpl in items.items():
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = data[key]
        if arr.shape != tmpl.shape:
            raise ValueError(
                f"checkpoint leaf {key!r} shape {arr.shape} != template "
                f"{tmpl.shape} (different SlamConfig?)"
            )
        leaves.append(jnp.asarray(arr.astype(tmpl.dtype, copy=False)))
    extra = {
        k.split("/", 1)[1]: data[k] for k in data.files if k.startswith("__extra__/")
    }
    return jax.tree_util.tree_unflatten(treedef, leaves), extra
