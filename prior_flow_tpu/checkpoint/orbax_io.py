"""Orbax checkpoint I/O for full training state.

An upgrade over the reference, which torch.saves weights only — optimizer/
scheduler/step state is lost on resume (SURVEY.md §5 "Checkpoint/resume",
train_flow.py:182-183). Here the complete ``TrainState`` (params, frozen
batch stats, optimizer state, step) round-trips.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

import orbax.checkpoint as ocp


def save_train_state(path: str, state) -> None:
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.tree_util.tree_map(np.asarray, state))
    # StandardCheckpointer context waits for completion on exit


def restore_train_state(path: str, template):
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def restore_any(path: str):
    """Restore a checkpoint without a structure template (numpy leaves).

    Accepts either a bare variables dict or a full TrainState directory —
    the inference CLIs use this so a Trainer-produced checkpoint loads
    directly (its ``params``/``batch_stats`` are extracted by the caller).
    """
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path)


def variables_from_checkpoint(path: str):
    """Model variables ({params[, batch_stats]}) from any checkpoint layout."""
    tree = restore_any(path)
    if "params" not in tree:
        raise ValueError(
            f"{path}: no 'params' in checkpoint (keys: {list(tree)})")
    variables = {"params": tree["params"]}
    if tree.get("batch_stats"):
        variables["batch_stats"] = tree["batch_stats"]
    return variables


def save_variables(path: str, variables) -> None:
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.tree_util.tree_map(np.asarray, dict(variables)))


def restore_variables(path: str, template) -> Any:
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, dict(template))
