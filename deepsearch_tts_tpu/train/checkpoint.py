"""Checkpoint / resume for params and train state (orbax).

The reference has no model checkpoints (nothing is trained; its resume story
is JSON trace files + budget-forcing re-entry, SURVEY.md §5). This framework
trains and serves its own weights, so it gets a real checkpoint subsystem:
orbax-backed save/restore of parameter pytrees and TrainState, with sharding
restored onto whatever mesh the restore-side process built.
"""
from __future__ import annotations

import os
from typing import Any

import jax


def save_params(path: str, params: Any, step: int | None = None) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path


def restore_params(path: str, like: Any | None = None) -> Any:
    """Restore a pytree; ``like`` (abstract shapes/shardings) restores onto
    the current mesh layout."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=getattr(x, "sharding", None)),
            like,
        )
        return ckptr.restore(os.path.abspath(path), abstract)
    return ckptr.restore(os.path.abspath(path))


def latest_step_dir(root: str) -> str | None:
    if not os.path.isdir(root):
        return None
    steps = [(int(d.split("_")[1]), d) for d in os.listdir(root)
             if d.startswith("step_") and d.split("_")[1].isdigit()]
    if not steps:
        return None
    return os.path.join(root, max(steps)[1])
