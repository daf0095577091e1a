"""Checkpoint / resume.

The reference's only persistent state is the scene .ply (SURVEY.md §5:
no writer exists). We provide both directions:

  * scene interchange: tpusplat.io.ply (reader AND writer, reference layout)
  * training state: full TrainState (params + optimizer moments + densify
    stats) via Orbax when available, with an npz fallback that has no extra
    dependencies. Multi-host jobs restart from these (SURVEY.md §5 failure
    row).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str, state: Any) -> None:
    """Save a pytree (e.g. TrainState) to ``path`` (directory or .npz)."""
    if path.endswith(".npz"):
        leaves, treedef = jax.tree_util.tree_flatten(state)
        np.savez_compressed(
            path,
            __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
        )
        return
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, like: Any) -> Any:
    """Load a checkpoint saved by save_checkpoint. ``like`` provides the
    pytree structure (and shardings, if its leaves are sharded arrays)."""
    if path.endswith(".npz"):
        data = np.load(path)
        leaves, treedef = jax.tree_util.tree_flatten(like)
        loaded = [data[f"leaf_{i}"] for i in range(len(leaves))]
        restored = [
            jax.device_put(l, x.sharding) if hasattr(x, "sharding") else l
            for l, x in zip(loaded, leaves)
        ]
        return jax.tree_util.tree_unflatten(treedef, restored)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)
