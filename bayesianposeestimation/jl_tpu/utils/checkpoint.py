"""Chain-state checkpointing (beyond-reference capability).

The reference has no mid-chain checkpointing — chains run seconds and resume
at experiment granularity via produce_or_load (SURVEY.md §5). For long TPU
runs (large particle counts, hyperopt sweeps, multi-hour trackers) this module
saves/restores any sampler state pytree (MCMCState, SmcState) to ``.npz``.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

__all__ = ["save_state", "load_state"]


def save_state(path, state):
    """Serialize a sampler-state pytree (array leaves) to npz."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    data = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **data)


def load_state(path, like):
    """Restore a state saved by :func:`save_state`; ``like`` provides the
    pytree structure (e.g. a freshly initialized state)."""
    _, treedef = jax.tree_util.tree_flatten(like)
    with np.load(path) as f:
        leaves = [f[f"leaf_{i}"] for i in range(len(f.files))]
    return jax.tree_util.tree_unflatten(treedef, leaves)
