#!/usr/bin/env python
"""Scaling-efficiency benchmark: sharded rollout throughput vs device count.

Runs the same jitted rollout with the env batch sharded over 1..N devices
(weak scaling: batch grows with devices) and reports parallel efficiency —
the measurement harness for the >=85% 1-chip -> 2-hosts target in
BASELINE.md. On a single-chip machine, run on the virtual CPU mesh to
validate the sharding path:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_test.py --per-device-envs 64

On a real pod slice it measures true ICI/DCN scaling (with
jax.distributed.initialize handled by parallel.mesh.initialize_multihost).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import jax.numpy as jnp

from bench import build_env
from jaxmarl_hft_tpu.parallel.mesh import (make_mesh, replicate,
                                           shard_leading_axis)


def run(n_devices, per_device_envs, n_steps, n_data_msg):
    env = build_env(n_data_msg=n_data_msg)
    n_envs = n_devices * per_device_envs
    mesh = make_mesh(n_devices)
    params = replicate(env.default_params, mesh)

    reset_keys = jax.random.split(jax.random.PRNGKey(0), n_envs)
    obs, state = jax.jit(jax.vmap(env.reset_env, in_axes=(0, None))
                         )(reset_keys, params)
    state = shard_leading_axis(state, mesh)

    def one_step(carry, key):
        state = carry
        ak, sk = jax.random.split(key)
        actions = []
        for i, sp in enumerate(env.action_spaces):
            a = jax.random.randint(jax.random.fold_in(ak, i), (n_envs, 1),
                                   0, sp.n)
            actions.append(a.squeeze(-1))
        step_keys = jax.random.split(sk, n_envs)
        obs, state, rewards, dones, info = jax.vmap(
            env.step, in_axes=(0, 0, 0, None))(step_keys, state, actions,
                                               params)
        return state, rewards[0][..., 0].sum()

    @jax.jit
    def rollout(state, key):
        keys = jax.random.split(key, n_steps)
        state, rs = jax.lax.scan(one_step, state, keys)
        return state, rs.sum()

    s2, r = rollout(state, jax.random.PRNGKey(1))
    jax.block_until_ready(s2)
    float(r)  # force full sync
    t0 = time.time()
    s3, r = rollout(state, jax.random.PRNGKey(2))
    jax.block_until_ready(s3)
    float(r)
    elapsed = time.time() - t0
    return n_envs * n_steps / elapsed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--n-data-msg", type=int, default=100)
    ap.add_argument("--devices", type=str, default=None,
                    help="comma list, default 1,max")
    args = ap.parse_args()

    n_avail = jax.device_count()
    counts = ([int(x) for x in args.devices.split(",")] if args.devices
              else sorted({1, n_avail}))
    results = {}
    base = None
    for n in counts:
        sps = run(n, args.per_device_envs, args.steps, args.n_data_msg)
        if base is None:
            base = sps
        eff = sps / (base * n / counts[0])
        results[n] = {"steps_per_sec": round(sps, 1),
                      "efficiency": round(eff, 3)}
        print(f"devices={n}: {sps:,.0f} steps/s  efficiency={eff:.1%}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
