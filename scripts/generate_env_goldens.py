#!/usr/bin/env python
"""Generate golden FULL-ENVIRONMENT episodes from the *upstream reference*
env stack (marl_env.py:211-709 and below), so end-to-end bit-equivalence is
checkable without the reference mount (tests/test_env_golden.py).

Protocol mirrors tests/test_env_vs_reference_live.py::test_episode_bit_equal
exactly: synthetic LOBSTER CSVs (tests/reference_env.py:write_lobster_csvs,
fixed seed) -> reference MARLEnv -> reset(PRNGKey(42)) -> up to 3 episodes of
steps with rng(7) random actions and fold_in(PRNGKey(100), step) step keys.
Recorded per step: every WorldState field, rewards, obs, dones, and agent
scalars.

Run (requires the reference at /root/reference or $REFERENCE_PATH):
    JAX_PLATFORMS=cpu python scripts/generate_env_goldens.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from reference_env import (make_reference_env, reference_available,
                           write_lobster_csvs)

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")

# One golden per scenario; the test rebuilds OUR env from the same dict.
SCENARIOS = {
    "env_golden_2p": dict(
        csv_seed=3, episode_steps=8, n_data_msg=10,
        mm=dict(action_space="fixed_quants", observation_space="basic",
                fixed_quant_value=1),
        ex=dict(action_space="fixed_quants_complex",
                observation_space="engineered", task="sell", task_size=100),
        mm_n_actions=10, ex_n_actions=13),
    "env_golden_2p_alt": dict(
        csv_seed=11, episode_steps=6, n_data_msg=20,
        mm=dict(action_space="spread_skew", observation_space="engineered",
                reward_function="portfolio_value"),
        ex=dict(action_space="fixed_quants_1msg",
                observation_space="basic", task="buy", task_size=200,
                reward_function="finish_fast"),
        mm_n_actions=6, ex_n_actions=5),
}


def _world_fields(ws):
    return {
        "asks": ws.ask_raw_orders, "bids": ws.bid_raw_orders,
        "trades": ws.trades, "best_asks": ws.best_asks,
        "best_bids": ws.best_bids, "time": ws.time,
        "order_id_counter": ws.order_id_counter, "mid_price": ws.mid_price,
        "step_counter": ws.step_counter, "window_index": ws.window_index,
        "start_index": ws.start_index, "delta_time": ws.delta_time,
    }


def record_episode(env, params, n_types):
    """Reset + step with the fixed protocol; returns dict of stacked arrays."""
    key = jax.random.PRNGKey(42)
    obs, state = env.reset_env(key, params)
    rec = {f"reset_obs_{i}": np.asarray(o) for i, o in enumerate(obs)}
    for k, v in _world_fields(state.world_state).items():
        rec[f"reset_world_{k}"] = np.asarray(v)

    rng = np.random.default_rng(7)
    steps = []
    for step in range(3 * 64):  # generous bound; break on done
        acts = [jnp.asarray(rng.integers(0, n), jnp.int32)
                for n in n_types]
        step_key = jax.random.fold_in(jax.random.PRNGKey(100), step)
        obs, state, rew, dones, info = env.step_env(step_key, state, acts,
                                                    params)
        row = {f"world_{k}": np.asarray(v)
               for k, v in _world_fields(state.world_state).items()}
        for i in range(len(n_types)):
            row[f"obs_{i}"] = np.asarray(obs[i])
            row[f"rew_{i}"] = np.asarray(rew[i])
            row[f"done_{i}"] = np.asarray(dones["agents"][i])
        row["done_all"] = np.asarray(dones["__all__"])
        row["actions"] = np.stack([np.asarray(a) for a in acts])
        steps.append(row)
        if bool(np.asarray(dones["__all__"])):
            break
    assert bool(np.asarray(dones["__all__"])), "episode never terminated"

    for k in steps[0]:
        rec[f"step_{k}"] = np.stack([s[k] for s in steps])
    rec["n_steps"] = np.asarray(len(steps))
    return rec


def main():
    assert reference_available(), "reference unavailable"
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, sc in SCENARIOS.items():
        root = tempfile.mkdtemp(prefix=f"golden_{name}_")
        data_root = os.path.join(root, "data")
        write_lobster_csvs(data_root, seed=sc["csv_seed"])
        env = make_reference_env(
            data_root, os.path.join(root, "ref_at"),
            episode_time=sc["episode_steps"],
            start_resolution=sc["episode_steps"],
            n_data_msg_per_step=sc["n_data_msg"], window_selector=-1,
            mm_overrides=sc["mm"], exec_overrides=sc["ex"],
            key=jax.random.PRNGKey(0))
        rec = record_episode(env, env.default_params,
                             (sc["mm_n_actions"], sc["ex_n_actions"]))
        np.savez_compressed(os.path.join(OUT_DIR, f"{name}.npz"), **rec)
        print(f"{name}: {int(rec['n_steps'])} steps recorded")


if __name__ == "__main__":
    main()
