#!/usr/bin/env python
"""Step-cost breakdown on the current backend: times scanned rollouts of
(a) the full auto-resetting step, (b) step_env only, (c) the engine scan
alone, (d) reset alone — all inside one jit + lax.scan so tunnel dispatch
latency doesn't pollute the numbers (see CLAUDE.md gotchas).

Usage: python scripts/profile_step.py [n_envs] [n_steps] [engine]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed_scan(fn, init, n_steps, label):
    """Rollout fn (carry, key) -> carry inside jit/scan; report ms/step."""
    @jax.jit
    def run(carry, key):
        keys = jax.random.split(key, n_steps)
        carry, _ = jax.lax.scan(fn, carry, keys)
        return carry, jnp.asarray(0, jnp.int32)

    t0 = time.time()
    carry, z = run(init, jax.random.PRNGKey(1))
    np.asarray(z)
    jax.block_until_ready(carry)
    compile_s = time.time() - t0
    t0 = time.time()
    carry, z = run(init, jax.random.PRNGKey(2))
    np.asarray(z)
    jax.block_until_ready(carry)
    dt = time.time() - t0
    print(f"{label:28s} {dt / n_steps * 1e3:8.2f} ms/step "
          f"(compile {compile_s:.0f}s)")
    return dt / n_steps


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    eng = sys.argv[3] if len(sys.argv) > 3 else "exact"

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    env = bench.build_env(engine=eng)
    params = env.default_params
    wc = env.config.world_config
    keys = jax.random.split(jax.random.PRNGKey(0), n_envs)
    obs, state0 = jax.jit(jax.vmap(env.reset_env, in_axes=(0, None))
                          )(keys, params)
    jax.block_until_ready(state0)
    acts = [jnp.zeros((n_envs,), jnp.int32), jnp.zeros((n_envs,), jnp.int32)]
    print(f"engine={eng} envs={n_envs} msgs/step={env.num_msgs_per_step} "
          f"device={jax.devices()[0]}")

    # (a) full auto-resetting step
    def full_step(state, key):
        ks = jax.random.split(key, n_envs)
        _, state, _, _, _ = jax.vmap(env.step, in_axes=(0, 0, 0, None))(
            ks, state, acts, params)
        return state, None
    t_full = timed_scan(full_step, state0, n_steps, "step (auto-reset)")

    # (b) step_env only
    def env_step(state, key):
        ks = jax.random.split(key, n_envs)
        _, state, _, _, _ = jax.vmap(env.step_env, in_axes=(0, 0, 0, None))(
            ks, state, acts, params)
        return state, None
    t_env = timed_scan(env_step, state0, n_steps, "step_env")

    # (c) engine scan alone on the same message shape
    from jaxmarl_hft_tpu.lob import engine, engine_sorted
    M = env.num_msgs_per_step
    msgs = jnp.zeros((n_envs, M, 8), jnp.int32)
    ws = state0.world_state
    scan_fn = engine_sorted.get_scan_fns(wc)[1]

    def eng_step(carry, key):
        asks, bids = carry
        ks = jax.random.split(key, n_envs)
        tr = engine.init_trades(wc.nTrades)
        (a, b, _), _ = jax.vmap(
            lambda k, m, s: scan_fn(wc, k, m, s, M)
        )(ks, msgs, (asks, bids,
                     jnp.broadcast_to(tr, (n_envs,) + tr.shape)))
        return (a, b), None
    t_eng = timed_scan(eng_step, (ws.ask_raw_orders, ws.bid_raw_orders),
                       n_steps, "engine scan (noop msgs)")

    # (d) reset alone
    def reset_step(carry, key):
        ks = jax.random.split(key, n_envs)
        _, st = jax.vmap(env.reset_env, in_axes=(0, None))(ks, params)
        return jax.tree.leaves(st)[0].sum() + carry, None
    t_res = timed_scan(reset_step, jnp.zeros((), jnp.int32), n_steps,
                       "reset_env")

    print(f"\nderived: non-engine env work = {t_env - t_eng:.4f}s/step, "
          f"auto-reset overhead = {t_full - t_env:.4f}s/step, "
          f"steps/s = {n_envs / t_full:.0f}")


if __name__ == "__main__":
    main()
