#!/usr/bin/env python
"""Learned-vs-baseline evaluation over all 2^n_types combinations.

Parity reference: gymnax_exchange/jaxrl/MARL/baseline_eval/baseline_JAXMARL
.py (seperate_main :1003 -> make_sim -> run). For each combo a separate env
is built because baseline agent types use scripted action spaces (MM ->
AvSt, Exec -> twap), mirroring the reference's BASELINE_CONFIGS override
layer (baseline_eval/config/2player_config.yaml:49-52).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


BASELINE_ACTION_SPACES = {"MarketMaking": "AvSt", "Execution": "twap"}


def build_env_for_combo(combo, base_cfg):
    """('L'|'B', ...) per agent type -> MarlEnv with baseline types switched
    to their scripted action spaces."""
    from jaxmarl_hft_tpu.config.structs import MultiAgentConfig, replace_cfg
    from jaxmarl_hft_tpu.envs.marl import MarlEnv

    agents = []
    for (name, cfg), tag in zip(base_cfg.agents, combo):
        if tag == "B" and name in BASELINE_ACTION_SPACES:
            cfg = replace_cfg(cfg,
                              action_space=BASELINE_ACTION_SPACES[name])
        agents.append((name, cfg))
    ma = MultiAgentConfig(world_config=base_cfg.world_config,
                          agents=tuple(agents),
                          number_of_agents_per_type=
                          base_cfg.number_of_agents_per_type)
    return MarlEnv(jax.random.PRNGKey(0), ma)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-config", type=str, default=None)
    ap.add_argument("--checkpoint-dir", type=str, default=None,
                    help="orbax checkpoint of trained policies; without it, "
                         "learned slots use a random policy")
    ap.add_argument("--num-envs", type=int, default=16)
    ap.add_argument("--num-steps", type=int, default=32)
    ap.add_argument("--gru-dim", type=int, default=64)
    ap.add_argument("--fc-dim", type=int, default=64)
    ap.add_argument("--out", type=str, default="eval_results.json")
    ap.add_argument("--save-trajectories", type=str, default=None)
    ap.add_argument("--greedy", action="store_true",
                    help="deterministic (mode) actions for learned policies "
                         "instead of sampling")
    ap.add_argument("--autoregressive", action="store_true",
                    help="restore checkpoints trained with the "
                         "AUTOREGRESSIVE chain-rule multi-head policy "
                         "(must match the training config)")
    args = ap.parse_args()

    from jaxmarl_hft_tpu.config.io import load_config
    from jaxmarl_hft_tpu.config.structs import (ExecConfig, MMConfig,
                                                MultiAgentConfig, WorldConfig)
    from jaxmarl_hft_tpu.rl.baselines import (FixedActionPolicy,
                                              LearnedPolicy, RandomPolicy,
                                              rollout)
    from jaxmarl_hft_tpu.rl.networks import ActorCriticRNN
    from jaxmarl_hft_tpu.rl.ippo import _action_dims
    from jaxmarl_hft_tpu.utils import trajio

    if args.env_config:
        base_cfg = load_config(args.env_config)
    else:
        base_cfg = MultiAgentConfig(
            world_config=WorldConfig(synthetic_data=True,
                                     synthetic_n_msgs=100_000,
                                     ep_type="fixed_steps", episode_time=32,
                                     start_resolution=32,
                                     n_data_msg_per_step=50,
                                     use_pickles_for_init=False),
            agents=(("MarketMaking",
                     MMConfig(action_space="fixed_quants",
                              observation_space="basic",
                              fixed_quant_value=1,
                              auto_liquidate_threshold=0,
                              unwind_price_penalty=0)),
                    ("Execution",
                     ExecConfig(action_space="fixed_quants_complex",
                                observation_space="engineered",
                                task_size=100))))

    restored = None
    if args.checkpoint_dir:
        from jaxmarl_hft_tpu.rl.checkpoint import (make_checkpoint_manager,
                                                   restore_model_params)
        mgr = make_checkpoint_manager(args.checkpoint_dir)
        restored = restore_model_params(mgr)
        print(f"restored checkpoint step {mgr.latest_step()}")

    import itertools
    n_types = len(base_cfg.agents)
    results = {}
    for combo in itertools.product("LB", repeat=n_types):
        env = build_env_for_combo(combo, base_cfg)
        policies = []
        net_cfg = {"FC_DIM_SIZE": args.fc_dim,
                   "GRU_HIDDEN_DIM": args.gru_dim,
                   "AUTOREGRESSIVE": args.autoregressive}
        for i, tag in enumerate(combo):
            if tag == "L":
                if restored is not None:
                    net = ActorCriticRNN(_action_dims(env.action_spaces[i]),
                                         config=net_cfg)
                    policies.append(LearnedPolicy(
                        net, restored[i], deterministic=args.greedy))
                else:
                    policies.append(RandomPolicy(env.action_spaces[i]))
            else:
                policies.append(FixedActionPolicy(0))
        rewards, dones, infos, actions = rollout(
            env, policies, args.num_envs, args.num_steps,
            gru_dim=args.gru_dim)
        name = "".join(combo)
        results[name] = {
            "mean_reward_per_type": [float(np.asarray(r).mean())
                                     for r in rewards],
            "episodes_done": int(np.asarray(dones["__all__"]).sum()),
        }
        print(name, results[name])
        if args.save_trajectories:
            os.makedirs(args.save_trajectories, exist_ok=True)
            trajio.save_traj(
                os.path.join(args.save_trajectories, f"traj_{name}.npz"),
                jax.device_get(
                    {"rewards": rewards, "infos": infos,
                     "actions": actions, "dones": dones,
                     "combo": name,
                     "agent_names": [n for n, _ in base_cfg.agents]}))

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
