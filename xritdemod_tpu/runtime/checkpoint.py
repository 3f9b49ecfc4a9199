"""Checkpoint/resume for long capture runs.

The reference has no checkpointing (SURVEY.md §5) — its stream is
self-synchronizing and output files append-only.  Here every stage's state
is an explicit pytree (demod carried state, decoder tail, statistics), so
checkpointing a long run is one `save_state` per N blocks: resume replays
nothing.

Plain `.npz` files (pytrees of ndarrays + a structure descriptor); no
orbax dependency for something this small.
"""

from __future__ import annotations

import json

import jax
import numpy as np

__all__ = ["save_state", "load_state"]


def save_state(path: str, state) -> None:
    """Save any pytree of arrays/scalars to `path` (.npz)."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_state(path: str, like):
    """Load a pytree saved by `save_state`, shaped like `like`.

    `like` supplies the tree structure (a freshly-initialized state);
    leaf values come from the file.  Raises if leaf counts mismatch.
    """
    data = np.load(path)
    leaves_like, treedef = jax.tree.flatten(like)
    n = len(leaves_like)
    stored = [data[f"leaf_{i}"] for i in range(n)]
    if f"leaf_{n}" in data.files:
        raise ValueError("checkpoint has more leaves than the target state")
    import jax.numpy as jnp

    new_leaves = [
        jnp.asarray(s, l.dtype if hasattr(l, "dtype") else None)
        for s, l in zip(stored, leaves_like)
    ]
    return jax.tree.unflatten(treedef, new_leaves)
