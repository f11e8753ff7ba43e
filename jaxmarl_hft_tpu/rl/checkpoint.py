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


# --------------------------------------------------------------------------
# Full training resume — an explicit improvement over the reference, which
# only restores parameters for evaluation (SURVEY.md §5: "No optimizer-
# state-resume of training mid-run"). Here the ENTIRE runner state (params,
# optimizer state incl. Adam moments and LR-anneal counts, env states, obs,
# dones, GRU hidden states, PRNG key) round-trips, so a resumed run is a
# bit-exact continuation of an uninterrupted one.
# --------------------------------------------------------------------------

def _runner_payload(runner_state, update_step: int):
    train_states, env_state, obsv, dones, hstates, rng = runner_state
    return {
        "params": [ts.params for ts in train_states],
        "opt_state": [ts.opt_state for ts in train_states],
        "ts_step": [ts.step for ts in train_states],
        "env_state": env_state,
        "obsv": list(obsv),
        "dones": list(dones),
        "hstates": list(hstates),
        "rng": rng,
        "update_step": jnp_int(update_step),
    }


def jnp_int(x):
    import jax.numpy as jnp
    return jnp.asarray(x, jnp.int32)


def save_train_checkpoint(manager, update_step: int, runner_state,
                          metrics: Any = None):
    """Save a full-resume checkpoint. Evaluation tooling reads parameters
    from the 'params' key (restore_model_params below handles both
    formats), so parameters are serialized once."""
    payload = _runner_payload(runner_state, update_step)
    if metrics is not None:
        payload["metrics"] = jax.device_get(
            jax.tree.map(lambda x: x, metrics.get("loss", [])))
    manager.save(update_step, args=ocp.args.StandardSave(
        jax.device_get(payload)))
    manager.wait_until_finished()


def restore_model_params(manager, step: int | None = None):
    """Restore just the per-type parameter list from either checkpoint
    format (eval-only 'model' or full-resume 'params')."""
    step = manager.latest_step() if step is None else step
    raw = manager.restore(step)
    return raw["model"] if "model" in raw else raw["params"]


def restore_train_checkpoint(manager, runner_state, step: int | None = None):
    """Restore into a freshly-initialised runner state (the target supplies
    the pytree structure). Returns (runner_state, next_update_step)."""
    step = manager.latest_step() if step is None else step
    raw = manager.restore(step)
    missing = {"opt_state", "env_state", "rng", "update_step"} - set(raw)
    if missing:
        raise ValueError(
            f"checkpoint step {step} is not a full-resume checkpoint "
            f"(missing {sorted(missing)}); it was saved eval-only. "
            "Re-train with --full-checkpoints to produce resumable "
            "checkpoints.")
    target = jax.device_get(_runner_payload(runner_state, 0))
    if "metrics" in raw:
        target["metrics"] = raw["metrics"]
    restored = manager.restore(step, args=ocp.args.StandardRestore(target))
    train_states, _, _, _, _, _ = runner_state
    new_ts = [ts.replace(params=p, opt_state=o, step=s)
              for ts, p, o, s in zip(train_states, restored["params"],
                                     restored["opt_state"],
                                     restored["ts_step"])]
    new_runner = (new_ts, restored["env_state"], restored["obsv"],
                  restored["dones"], restored["hstates"], restored["rng"])
    return new_runner, int(restored["update_step"]) + 1
