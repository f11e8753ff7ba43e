"""Device-mesh utilities: jit + NamedSharding data parallelism.

This replaces the reference's entire distribution story — single-host
jax.pmap with lax.pmean gradient sync (ippo_rnn_JAXMARL_pmap.py:281-793) —
with the TPU-native pattern: one jitted program over a Mesh, the env batch
sharded along a 'data' axis, parameters replicated, and XLA inserting the
gradient all-reduce over ICI automatically. Multi-host pods extend the same
code via jax.distributed.initialize (no per-backend code).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data"
              ) -> Mesh:
    """1-D data-parallel mesh over the first n_devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = "data"
                   ) -> NamedSharding:
    """Shard the leading (env-batch) axis, replicate the rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def shard_leading_axis(tree, mesh: Mesh, axis_name: str = "data"):
    """Place every leaf with its leading axis sharded over the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, batch_sharding(mesh, np.ndim(x), axis_name)), tree)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, replicated(mesh)), tree)


def shard_runner_state(runner_state, mesh: Mesh, axis_name: str = "data"):
    """Shard an IPPO runner state: env state/obs/done/hidden batches over the
    data axis; train states (params+opt) replicated."""
    train_states, env_state, obsv, dones, hstates, rng = runner_state
    return (
        replicate(train_states, mesh),
        shard_leading_axis(env_state, mesh, axis_name),
        shard_leading_axis(obsv, mesh, axis_name),
        shard_leading_axis(dones, mesh, axis_name),
        shard_leading_axis(hstates, mesh, axis_name),
        jax.device_put(rng, replicated(mesh)),
    )


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None):
    """Multi-host pod initialisation. On TPU pods arguments are autodetected;
    this is the DCN story the reference lacks entirely."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
