"""Orbax checkpointing for per-type train states.

Parity reference: ippo_rnn_JAXMARL.py:1088-1133 (CheckpointManager with
max_to_keep + keep_period saving {'model': train_states, 'metrics': ...});
restore path mirrors baseline_JAXMARL.py:502-585.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def make_checkpoint_manager(directory: str, *, max_to_keep: int = 2,
                            keep_period: int | None = None):
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                           save_interval_steps=1,
                                           keep_period=keep_period)
    return ocp.CheckpointManager(directory, options=options)


def save_checkpoint(manager, step: int, train_states, metrics: Any = None):
    """Save the per-type train-state parameters (+ scalar metrics)."""
    payload = {"model": [jax.device_get(ts.params) for ts in train_states]}
    if metrics is not None:
        payload["metrics"] = jax.device_get(
            jax.tree.map(lambda x: x, metrics.get("loss", [])))
    manager.save(step, args=ocp.args.StandardSave(payload))
    manager.wait_until_finished()


def restore_checkpoint(manager, step: int | None = None, target=None):
    """Restore parameters; with `target` given, restores into its structure."""
    step = manager.latest_step() if step is None else step
    if target is not None:
        return manager.restore(step, args=ocp.args.StandardRestore(target))
    return manager.restore(step)
