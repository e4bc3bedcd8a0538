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


def save_variables(path: str, variables) -> None:
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.tree_util.tree_map(np.asarray, dict(variables)))


def restore_variables(path: str, template) -> Any:
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, dict(template))
