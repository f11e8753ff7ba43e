#!/usr/bin/env python
"""Generate golden FULL-ENVIRONMENT episodes from the *upstream reference*
env stack (marl_env.py:211-709 and below), so end-to-end bit-equivalence is
checkable without the reference mount (tests/test_env_golden.py).

Protocol mirrors tests/test_env_vs_reference_live.py::test_episode_bit_equal:
synthetic LOBSTER CSVs (tests/reference_env.py:write_lobster_csvs, fixed
seed) -> reference MARLEnv -> reset(PRNGKey(42)) -> steps with rng(7) random
actions and fold_in(PRNGKey(100), step) step keys, until done. Recorded per
step: every WorldState field, rewards, obs, dones, and the actions (a
protocol-drift guard for the replaying test).

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

import numpy as np

from reference_env import (import_reference_env, reference_available,
                           write_lobster_csvs)

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")

from golden_scenarios import (SCENARIOS, draw_actions,
                              world_fields)


def record_episode(env, params, agents):
    """Reset + step with the fixed protocol; returns dict of stacked arrays."""
    key = jax.random.PRNGKey(42)
    obs, state = env.reset_env(key, params)
    rec = {f"reset_obs_{i}": np.asarray(o) for i, o in enumerate(obs)}
    for k, v in world_fields(state.world_state).items():
        rec[f"reset_world_{k}"] = np.asarray(v)

    rng = np.random.default_rng(7)
    steps = []
    for step in range(3 * 64):  # generous bound; break on done
        acts = draw_actions(rng, agents)
        step_key = jax.random.fold_in(jax.random.PRNGKey(100), step)
        obs, state, rew, dones, info = env.step_env(step_key, state, acts,
                                                    params)
        row = {f"world_{k}": np.asarray(v)
               for k, v in world_fields(state.world_state).items()}
        for i in range(len(agents)):
            row[f"obs_{i}"] = np.asarray(obs[i])
            row[f"rew_{i}"] = np.asarray(rew[i])
            row[f"done_{i}"] = np.asarray(dones["agents"][i])
            row[f"actions_{i}"] = np.asarray(acts[i])
        row["done_all"] = np.asarray(dones["__all__"])
        steps.append(row)
        if bool(np.asarray(dones["__all__"])):
            break
    assert bool(np.asarray(dones["__all__"])), "episode never terminated"

    for k in steps[0]:
        rec[f"step_{k}"] = np.stack([s[k] for s in steps])
    rec["n_steps"] = np.asarray(len(steps))
    return rec


def build_reference_env(sc, root):
    ref_marl, ref_cfg = import_reference_env()
    data_root = os.path.join(root, "data")
    write_lobster_csvs(data_root, seed=sc["csv_seed"])
    world = ref_cfg.World_EnvironmentConfig(
        n_data_msg_per_step=sc["n_data_msg"], window_selector=-1,
        ep_type="fixed_steps", episode_time=sc["episode_steps"],
        start_resolution=sc["episode_steps"], dataPath=data_root,
        alphatradePath=os.path.join(root, "ref_at"), stock="TEST",
        timePeriod="2024")
    kind_map = {"MM": ref_cfg.MarketMaking_EnvironmentConfig,
                "Exec": ref_cfg.Execution_EnvironmentConfig}
    ma = ref_cfg.MultiAgentConfig(
        world_config=world,
        dict_of_agents_configs={name: kind_map[kind](**ovr)
                                for name, kind, ovr, _, _ in sc["agents"]},
        number_of_agents_per_type=[n for *_, n in sc["agents"]])
    return ref_marl.MARLEnv(jax.random.PRNGKey(0), multi_agent_config=ma)


def main():
    assert reference_available(), "reference unavailable"
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, sc in SCENARIOS.items():
        root = tempfile.mkdtemp(prefix=f"golden_{name}_")
        env = build_reference_env(sc, root)
        rec = record_episode(env, env.default_params, sc["agents"])
        np.savez_compressed(os.path.join(OUT_DIR, f"{name}.npz"), **rec)
        print(f"{name}: {int(rec['n_steps'])} steps recorded")


if __name__ == "__main__":
    main()
