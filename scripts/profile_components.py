#!/usr/bin/env python
"""Component-level cost breakdown of MarlEnv.step_env on the current backend.

Times each stage of the step pipeline separately at batch scale — per-type
get_messages, the engine scan over the REAL combined message stream,
per-type get_reward / update_state / get_observation, and the best-price
ffill — each inside one jit+lax.scan so dispatch latency is amortized and
with a per-iteration input perturbation so XLA cannot hoist the body out of
the loop as loop-invariant.

Usage: python scripts/profile_components.py [n_envs] [n_iters] [engine]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(label, fn, *args, n_iters=16):
    """fn(perturb_i32, *args) -> array; scanned n_iters times."""
    @jax.jit
    def run(args):
        def body(acc, i):
            out = fn(i, *args)
            return acc + jnp.sum(out).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(n_iters, dtype=jnp.int32))
        return acc

    t0 = time.time()
    np.asarray(run(args)); compile_s = time.time() - t0
    t0 = time.time()
    np.asarray(run(args)); dt = time.time() - t0
    print(f"{label:34s} {dt / n_iters * 1e3:8.2f} ms/step "
          f"(compile {compile_s:.0f}s)", flush=True)
    return dt / n_iters


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    eng = sys.argv[3] if len(sys.argv) > 3 else "exact"

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from jaxmarl_hft_tpu.lob import engine, engine_sorted
    from jaxmarl_hft_tpu.envs import marl as marl_mod

    env = bench.build_env(engine=eng)
    wc = env.config.world_config
    params = env.default_params
    keys = jax.random.split(jax.random.PRNGKey(0), n_envs)
    obs, state = jax.jit(jax.vmap(env.reset_env, in_axes=(0, None))
                         )(keys, params)

    # one real step to get a realistic mid-episode state + combined stream
    acts = [jnp.zeros((n_envs,), jnp.int32),
            jnp.ones((n_envs,), jnp.int32)]
    step_keys = jax.random.split(jax.random.PRNGKey(1), n_envs)
    _, state, _, _, _ = jax.jit(jax.vmap(env.step_env,
                                         in_axes=(0, 0, 0, None))
                                )(step_keys, state, acts, params)
    jax.block_until_ready(state)
    ws = state.world_state
    print(f"engine={eng} envs={n_envs} msgs/step={env.num_msgs_per_step} "
          f"device={jax.devices()[0]}", flush=True)

    total = 0.0

    # ---- (C) per-type get_messages -----------------------------------
    for idx, name in enumerate(env.type_names):
        inst = env.instance_list[idx]

        def gm(i, ws, ast, ap, inst=inst):
            a = jnp.broadcast_to((i % 3).astype(jnp.int32), (n_envs, 1))
            out = jax.vmap(jax.vmap(inst.get_messages,
                                    in_axes=(0, None, 0, 0)),
                           in_axes=(0, 0, 0, None))(a, ws, ast, ap)
            return out[0].astype(jnp.float32)

        total += timed(f"(C) get_messages[{name}]", gm, ws,
                       state.agent_states[idx], params.agent_params[idx],
                       n_iters=n_iters)

    # ---- (D) engine scan over a REAL message mix ----------------------
    # reconstruct a combined stream: use the data slice + synthetic agent
    # messages perturbed per iteration
    data_msgs = jax.vmap(
        lambda s: env.base_env.get_data_messages(
            params.loaded_params.message_data, s.start_index,
            s.step_counter, s.init_time[0] + wc.episode_time))(ws)
    n_agent_msgs = env.num_msgs_per_step - wc.n_data_msg_per_step
    pad = jnp.zeros((n_envs, n_agent_msgs, 8), jnp.int32)
    combined = jnp.concatenate([pad, data_msgs], axis=1)

    _, scan_bidask = engine_sorted.get_scan_fns(wc)

    def dscan(i, combined, ws):
        msgs = combined.at[:, 0, 5].add(i * 0)   # defeat hoisting, no-op
        msgs = jnp.roll(msgs, i, axis=0)          # vary env<->stream pairing
        out = jax.vmap(lambda k, m, s: scan_bidask(
            wc, k, m, s, env.num_msgs_per_step))(
            jax.random.split(jax.random.fold_in(jax.random.PRNGKey(2), 0),
                             n_envs),
            msgs, (ws.ask_raw_orders, ws.bid_raw_orders,
                   jnp.broadcast_to(engine.init_trades(wc.nTrades),
                                    (n_envs, wc.nTrades, 8))))
        return out[0][2].astype(jnp.float32)

    total += timed("(D) engine scan (real stream)", dscan, combined, ws,
                   n_iters=n_iters)

    # ---- ffill ---------------------------------------------------------
    def dffill(i, ba):
        ba = ba.at[:, 0, 0].add(i * 0)
        return jax.vmap(marl_mod.MarlEnv._ffill_best_prices,
                        in_axes=(0, 0))(ba, ba[:, -1, 0] + i)

    total += timed("    ffill best prices x2", dffill, ws.best_asks,
                   n_iters=n_iters) * 2

    # ---- (E) rewards ---------------------------------------------------
    # NOTE on all bodies below: the per-iteration perturbation must actually
    # reach the computation (e.g. `+ i % 2`, not `+ i * 0`) or XLA's
    # loop-invariant code motion hoists the whole body out of the timing
    # scan and under-reports by n_iters x.
    for idx, name in enumerate(env.type_names):
        inst = env.instance_list[idx]

        def rw(i, ws, ast, ap, inst=inst):
            tr = ws.trades.at[:, 0, 1].add(i % 2)
            out = jax.vmap(jax.vmap(inst.get_reward,
                                    in_axes=(None, 0, 0, None, None, None,
                                             None)),
                           in_axes=(0, 0, None, 0, 0, 0, None))(
                ws, ast, ap, tr, ws.best_asks, ws.best_bids, False)
            return out[0].astype(jnp.float32)

        total += timed(f"(E) get_reward[{name}]", rw, ws,
                       state.agent_states[idx], params.agent_params[idx],
                       n_iters=n_iters)

    # ---- (G) update_state: not timed — it only repacks the reward
    # extras dict into the new agent state (update_state_and_get_done_
    # and_info), zero additional compute; its cost is inside (E).

    # ---- (K) observations -----------------------------------------------
    for idx, name in enumerate(env.type_names):
        inst = env.instance_list[idx]

        def go(i, ws, ast, ap, inst=inst, idx=idx):
            ws = ws.replace(mid_price=ws.mid_price + (i % 2))
            out = jax.vmap(jax.vmap(
                lambda w, a, p: inst.get_observation(
                    w, a, p, None, w.time, w.mid_price + 0.0, None,
                    env.agent_configs[idx].normalize, True),
                in_axes=(None, 0, 0)), in_axes=(0, 0, None))(ws, ast, ap)
            return out.astype(jnp.float32)

        try:
            total += timed(f"(K) get_observation[{name}]", go, ws,
                           state.agent_states[idx], params.agent_params[idx],
                           n_iters=n_iters)
        except Exception as e:
            print(f"(K) get_observation[{name}] skipped: {type(e).__name__}")

    print(f"{'sum of components':34s} {total * 1e3:8.2f} ms/step",
          flush=True)


if __name__ == "__main__":
    main()
