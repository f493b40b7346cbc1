"""Filter-state checkpointing.

The reference has no filesystem checkpointing — the node only retains its
last pose estimate across map swaps (amcl_node.cpp:450-497).  With dense
array state, full-fidelity checkpoints (particle arrays + PRNG key + filter
bookkeeping) are nearly free, so the TPU build adds them (SURVEY.md §5):
resuming from a checkpoint continues the exact same filter trajectory.

Any pytree of arrays works (AmclState, fleets of AmclState, custom filters).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def save_state(path: str, state: Any) -> None:
    """Save a pytree of arrays to an .npz file."""
    leaves = jax.tree_util.tree_leaves(state)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(x)) for i, x in enumerate(leaves)}
    np.savez_compressed(path, num_leaves=np.int64(len(leaves)), **arrays)


def load_state(path: str, template: Any) -> Any:
    """Restore a pytree saved by :func:`save_state`.

    ``template`` provides the tree structure (and target dtypes); typically
    a freshly initialized state of the same configuration.
    """
    data = np.load(path)
    n = int(data["num_leaves"])
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(t_leaves) != n:
        raise ValueError(
            f"checkpoint has {n} leaves but template has {len(t_leaves)}"
        )
    leaves = []
    for i, t in enumerate(t_leaves):
        arr = data[f"leaf_{i}"]
        if tuple(arr.shape) != tuple(t.shape):
            raise ValueError(
                f"leaf {i}: checkpoint shape {arr.shape} != template {t.shape}"
            )
        leaves.append(jax.numpy.asarray(arr.astype(t.dtype)))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_state_sharded(path: str, state: Any) -> None:
    """Orbax checkpoint of a (possibly sharded) filter state.

    Unlike :func:`save_state`, arrays are written per-shard without
    gathering to one host — the right tool for mega filters and fleets
    sharded across a pod (each host writes only its shards).  ``path``
    must be an absolute directory path.
    """
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.tree_util.tree_map(lambda x: x, state), force=True)


def load_state_sharded(path: str, template: Any) -> Any:
    """Restore an orbax checkpoint, resharding onto ``template``'s layout."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)
