"""Checkpoint / resume for training state and model params.

The reference's persistence story is pickles + DB files (SURVEY.md §5.4);
the index artifacts cover that side. This module covers the *model* side:
orbax-backed checkpointing of ``TrainState`` (params + optimizer state +
step) and bare param trees, sharding-aware on restore (params land back on
their mesh shardings).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_train_state(directory: str, state, step: Optional[int] = None) -> str:
    """Save a TrainState; returns the checkpoint path."""
    step = int(state.step) if step is None else step
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    tree = {"step": np.asarray(state.step),
            "params": state.params, "opt_state": state.opt_state}
    _checkpointer().save(path, tree)
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(os.path.abspath(directory), max(steps)[1])


def restore_train_state(path: str, state_template):
    """Restore into the structure (and shardings) of ``state_template``."""
    import orbax.checkpoint as ocp
    import jax.numpy as jnp
    from ragmeup_tpu.train.train import TrainState

    from jax.sharding import NamedSharding, PartitionSpec as P

    template = {"step": np.asarray(state_template.step),
                "params": state_template.params,
                "opt_state": state_template.opt_state}
    # find the mesh from any sharded param so unsharded leaves (step,
    # optimizer counters) restore replicated on the same mesh, not pinned
    # to a single device
    mesh = None
    for leaf in jax.tree_util.tree_leaves(template):
        s = getattr(leaf, "sharding", None)
        if isinstance(s, NamedSharding):
            mesh = s.mesh
            break
    replicated = NamedSharding(mesh, P()) if mesh is not None else None

    def leaf_sharding(x):
        s = getattr(x, "sharding", None)
        return s if isinstance(s, NamedSharding) else replicated

    shardings = jax.tree_util.tree_map(leaf_sharding, template)
    restore_args = jax.tree_util.tree_map(
        lambda s: ocp.ArrayRestoreArgs(sharding=s) if s is not None else
        ocp.RestoreArgs(), shardings)
    tree = _checkpointer().restore(
        path, restore_args=restore_args, item=template)
    return TrainState(step=jnp.asarray(tree["step"]),
                      params=tree["params"], opt_state=tree["opt_state"])


def save_params(directory: str, params: Any, name: str = "params") -> str:
    path = os.path.join(os.path.abspath(directory), name)
    _checkpointer().save(path, params)
    return path


def restore_params(path: str, template: Optional[Any] = None) -> Any:
    return _checkpointer().restore(path, item=template)
