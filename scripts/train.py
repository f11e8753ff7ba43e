#!/usr/bin/env python
"""IPPO-RNN training CLI.

Parity reference: gymnax_exchange/jaxrl/MARL/ippo_rnn_JAXMARL.py's hydra
entrypoint (:1145-1274). Uses argparse + JSON/YAML instead of hydra/wandb
(not available here); the same three-layer config precedence applies
(dataclass defaults < env-config file < CLI/RL-config overrides).

Usage:
    python scripts/train.py --env-config configs/2_player_fq_fqc_synth.json \
        --rl-config configs/ippo_2player.yaml --num-updates 10
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-config", type=str, default=None,
                    help="JSON env config (reference env_configs schema)")
    ap.add_argument("--rl-config", type=str, default=None,
                    help="YAML/JSON RL hyperparameter config")
    ap.add_argument("--num-updates", type=int, default=None)
    ap.add_argument("--num-envs", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--checkpoint-dir", type=str, default=None)
    ap.add_argument("--resume", action="store_true",
                    help="resume bit-exactly from the latest full checkpoint "
                         "in --checkpoint-dir (implies --full-checkpoints)")
    ap.add_argument("--full-checkpoints", action="store_true",
                    help="save resumable checkpoints (params + optimizer + "
                         "env/PRNG state), not just eval params")
    ap.add_argument("--log-file", type=str, default=None,
                    help="JSONL metrics log")
    ap.add_argument("--wandb", action="store_true",
                    help="mirror per-update metrics to Weights & Biases "
                         "(requires the wandb package; reference parity: "
                         "io_callback logging, ippo_rnn_JAXMARL.py:1067)")
    ap.add_argument("--wandb-project", type=str, default="jaxmarl-hft-tpu")
    ap.add_argument("--synthetic", action="store_true",
                    help="use synthetic data regardless of config")
    ap.add_argument("--mesh", type=int, default=None,
                    help="shard env batch over N devices")
    ap.add_argument("--trade-cap", type=int, default=None,
                    help="override world_config.trade_capture_cap (16 ~2x "
                         "training throughput vs the exact default; exact "
                         "unless one message fills >cap orders)")
    ap.add_argument("--network-dtype", type=str, default=None,
                    choices=["float32", "bfloat16"],
                    help="network compute dtype (bfloat16 = MXU-native; "
                         "params/logits/values stay float32)")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="every N updates (N must align with "
                         "--chunk-updates: eval runs at chunk boundaries), "
                         "run a stochastic-policy rollout on a separate "
                         "eval env and log eval_avg_reward (reference: "
                         "CALC_EVAL on-device eval, ippo_rnn_JAXMARL.py"
                         ":876-975). Same data distribution unless "
                         "--eval-env-config points at held-out data")
    ap.add_argument("--eval-env-config", type=str, default=None,
                    help="separate env-config JSON for the eval env (e.g. a "
                         "held-out timePeriod, mirroring the reference's "
                         "eval data period); defaults to the training config")
    ap.add_argument("--eval-envs", type=int, default=8)
    ap.add_argument("--eval-steps", type=int, default=32)
    ap.add_argument("--eval-seed", type=int, default=1234,
                    help="construction seed for the eval env")
    ap.add_argument("--env-chunks", type=int, default=None,
                    help="split the rollout env batch into N sequential "
                         "chunks per step (bit-identical; +12%% with the "
                         "capped exact engine at 4096 envs, keep 1 for "
                         "psort and mesh runs)")
    ap.add_argument("--chunk-updates", type=int, default=1,
                    help="scan N update steps per jitted program (one host "
                         "metrics fetch per chunk instead of per update; "
                         "bit-identical math)")
    ap.add_argument("--sweep-parallel", type=int, default=1,
                    help="run SWEEP_PARAMETERS grid points in N parallel "
                         "worker processes (each its own JAX runtime; the "
                         "reference parallelises via WandB sweep agents, "
                         "ippo_rnn_JAXMARL.py:1168-1274)")
    ap.add_argument("--sweep-point", type=int, default=None,
                    help="internal: run only grid point N of the sweep")
    ap.add_argument("--platform", type=str, default=None,
                    choices=["cpu", "tpu"],
                    help="force a JAX platform (the axon TPU plugin ignores "
                         "the JAX_PLATFORMS env var; this applies "
                         "jax.config.update post-import, which works)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from jaxmarl_hft_tpu.config.io import load_config
    from jaxmarl_hft_tpu.config.structs import (MultiAgentConfig,
                                                WorldConfig, replace_cfg)

    if args.env_config:
        ma_cfg = load_config(args.env_config)
    else:
        ma_cfg = MultiAgentConfig(world_config=WorldConfig(
            synthetic_data=True, synthetic_n_msgs=200_000,
            ep_type="fixed_steps", episode_time=64, start_resolution=64,
            n_data_msg_per_step=100, use_pickles_for_init=False))
    if args.synthetic:
        ma_cfg = MultiAgentConfig(
            world_config=replace_cfg(ma_cfg.world_config,
                                     synthetic_data=True,
                                     use_pickles_for_init=False),
            agents=ma_cfg.agents,
            number_of_agents_per_type=ma_cfg.number_of_agents_per_type)
    if args.trade_cap is not None:
        ma_cfg = MultiAgentConfig(
            world_config=replace_cfg(ma_cfg.world_config,
                                     trade_capture_cap=args.trade_cap),
            agents=ma_cfg.agents,
            number_of_agents_per_type=ma_cfg.number_of_agents_per_type)

    rl_overrides = {}
    if args.rl_config:
        with open(args.rl_config) as f:
            if args.rl_config.endswith((".yaml", ".yml")):
                import yaml
                rl_overrides = yaml.safe_load(f) or {}
            else:
                rl_overrides = json.load(f)

    # SWEEP_PARAMETERS: {param: {values: [...]}} expands to a sequential
    # grid of runs (reference: WandB sweep grids, ippo_rnn_JAXMARL.py
    # :1168-1274 — here run locally one after another). A swept
    # AGENT_CONFIGS entry overrides per-agent env-config fields via the
    # same three-layer precedence as the reference.
    sweep = rl_overrides.pop("SWEEP_PARAMETERS", None)
    if sweep:
        keys, points = expand_sweep(sweep)

        if args.sweep_parallel > 1 and args.sweep_point is None:
            # dispatch each grid point to its own interpreter, N at a time
            # (process isolation = independent XLA runtimes/devices; the
            # reference gets this from `wandb agent` workers)
            import subprocess
            base = [sys.executable, os.path.abspath(__file__)]
            for a in sys.argv[1:]:
                base.append(a)
            running, rc = [], 0
            for i in range(len(points)):
                cmd = list(base) + ["--sweep-point", str(i)]
                if args.log_file:
                    j = cmd.index("--log-file")
                    cmd[j + 1] = f"{args.log_file}.point{i}"
                running.append((i, subprocess.Popen(cmd)))
                while len(running) >= args.sweep_parallel:
                    i0, p0 = running.pop(0)
                    rc |= p0.wait()
            for i0, p0 in running:
                rc |= p0.wait()
            if rc:
                raise SystemExit("one or more sweep workers failed")
            return

        for pt_idx, point in enumerate(points):
            if args.sweep_point is not None and pt_idx != args.sweep_point:
                continue
            point_cfg, overrides, tag = apply_sweep_point(
                ma_cfg, rl_overrides, keys, point)
            print(f"=== sweep point: {tag}")
            _run_one(args, point_cfg, overrides, tag)
        return

    _run_one(args, ma_cfg, rl_overrides, None)


def expand_sweep(sweep):
    """SWEEP_PARAMETERS {param: {values: [...]} | [...]} -> (keys, grid
    points), the full cartesian product in declaration order (reference:
    WandB 'grid' sweep method, ippo_rnn_JAXMARL_2player.yaml:69-96)."""
    import itertools as it
    keys = list(sweep)
    grids = [sweep[k]["values"] if isinstance(sweep[k], dict)
             else sweep[k] for k in keys]
    return keys, list(it.product(*grids))


def apply_sweep_point(ma_cfg, rl_overrides, keys, point):
    """Overrides for one grid point: swept RL hyperparams layer on top of
    the base rl_overrides; a swept AGENT_CONFIGS entry rebuilds the agent
    configs through the same three-layer precedence as config loading
    (dataclass defaults < env-config file < sweep override). Returns
    (point_env_cfg, point_rl_overrides, tag)."""
    from jaxmarl_hft_tpu.config.io import config_to_dict, make_agent_configs
    from jaxmarl_hft_tpu.config.structs import MultiAgentConfig

    overrides = dict(rl_overrides)
    overrides.update(dict(zip(keys, point)))
    point_cfg = ma_cfg
    agent_over = overrides.pop("AGENT_CONFIGS", None)
    if agent_over:
        merged = config_to_dict(ma_cfg)
        merged["AGENT_CONFIGS"] = agent_over
        acs = make_agent_configs(merged)
        point_cfg = MultiAgentConfig(
            world_config=ma_cfg.world_config,
            agents=tuple((n, acs[n]) for n, _ in ma_cfg.agents),
            number_of_agents_per_type=ma_cfg.number_of_agents_per_type)
    tag = ",".join(f"{k}={v}" for k, v in zip(keys, point))
    return point_cfg, overrides, tag


def _run_one(args, ma_cfg, rl_overrides, tag):
    from jaxmarl_hft_tpu.envs.marl import MarlEnv
    from jaxmarl_hft_tpu.rl.ippo import default_train_config, make_train

    cfg = default_train_config(**rl_overrides)
    cfg["SEED"] = args.seed
    if args.network_dtype:
        cfg["NETWORK_DTYPE"] = args.network_dtype
    if args.num_envs:
        cfg["NUM_ENVS"] = args.num_envs
    if args.env_chunks:
        cfg["ENV_CHUNKS"] = args.env_chunks

    print(f"devices: {jax.devices()}")
    env = MarlEnv(jax.random.PRNGKey(cfg["SEED"]), ma_cfg)
    print(f"env: {env.num_agents} agents, {env.num_msgs_per_step} msgs/step, "
          f"{env.base_env.n_windows} windows")

    mesh = None
    if args.mesh:
        from jaxmarl_hft_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.mesh)

    train = make_train(cfg, env, mesh=mesh)

    if args.resume and not args.checkpoint_dir:
        raise SystemExit("--resume requires --checkpoint-dir")
    ckpt_mgr = None
    if args.checkpoint_dir:
        from jaxmarl_hft_tpu.rl.checkpoint import make_checkpoint_manager
        ckpt_dir = (os.path.join(args.checkpoint_dir, tag) if tag
                    else args.checkpoint_dir)
        ckpt_mgr = make_checkpoint_manager(ckpt_dir)

    log_f = open(args.log_file, "a") if args.log_file else None
    wandb_logger = None
    if args.wandb:
        from jaxmarl_hft_tpu.utils.logging import MetricsLogger
        wandb_logger = MetricsLogger(
            None, use_wandb=True,
            wandb_kwargs={"project": args.wandb_project,
                          **({"group": tag} if tag else {})})
        if not wandb_logger.wandb_active:
            # the user EXPLICITLY asked for the mirror; a silent no-op
            # would be discovered hours into the run
            raise SystemExit("--wandb requested but the wandb package is "
                             "not importable; install it or drop --wandb")
    t_start = time.time()
    first_step = [None]   # resumed runs start at the checkpoint's update

    def log_fn(step, metrics):
        elapsed = time.time() - t_start
        if first_step[0] is None:
            first_step[0] = step
        steps_done = (step - first_step[0] + 1) \
            * cfg["NUM_STEPS"] * cfg["NUM_ENVS"]
        line = {
            **({"sweep": tag} if tag else {}),
            "update": step,
            "env_steps": steps_done,
            "steps_per_sec": steps_done / elapsed,
            "loss": [{k: float(v) for k, v in l.items()}
                     for l in metrics["loss"]],
            "avg_reward": [float(r) for r in metrics["avg_reward"]],
            # fraction of rollout steps whose trade capture overflowed the
            # cap (0.0 = this update is CERTIFIED bit-identical to
            # fully-exact capture; always 0.0 for psort/sorted engines)
            "trade_overflow_frac": float(
                metrics["world"]["trade_overflow"]),
        }
        if "eval_avg_reward" in metrics:
            line["eval_avg_reward"] = metrics["eval_avg_reward"]
        print(f"update {step}: loss="
              f"{[round(l['total_loss'], 4) for l in line['loss']]} "
              f"reward={[round(r, 3) for r in line['avg_reward']]} "
              f"sps={line['steps_per_sec']:.0f}"
              + (f" eval={[round(r, 3) for r in line['eval_avg_reward']]}"
                 if "eval_avg_reward" in line else ""))
        if log_f:
            log_f.write(json.dumps(line) + "\n")
            log_f.flush()
        if wandb_logger is not None:
            wandb_logger.log(step, {k: v for k, v in line.items()
                                    if k != "update"})

    eval_env = None
    if args.eval_every > 0:
        if args.eval_every % max(args.chunk_updates, 1):
            print(f"WARNING: --eval-every {args.eval_every} is not a "
                  f"multiple of --chunk-updates {args.chunk_updates}; eval "
                  "only runs at chunk boundaries, so it will fire every "
                  "LCM(eval_every, chunk) updates (possibly never)")
        eval_cfg = ma_cfg
        if args.eval_env_config:
            # held-out data period: take the WORLD config from the eval
            # preset but keep the training agents — the trained parameters
            # are applied to the eval env, so action/obs spaces must match
            # (reference: eval env on a held-out data period,
            # ippo_rnn_JAXMARL.py:478-482)
            from jaxmarl_hft_tpu.config.io import load_config
            from jaxmarl_hft_tpu.config.structs import MultiAgentConfig
            eval_cfg = MultiAgentConfig(
                world_config=load_config(args.eval_env_config).world_config,
                agents=ma_cfg.agents,
                number_of_agents_per_type=
                ma_cfg.number_of_agents_per_type)
        eval_env = MarlEnv(jax.random.PRNGKey(args.eval_seed), eval_cfg)

    full = args.full_checkpoints or args.resume
    out = train(jax.random.PRNGKey(cfg["SEED"]),
                num_updates=args.num_updates, log_fn=log_fn,
                checkpoint_manager=ckpt_mgr, full_checkpoints=full,
                resume_from=ckpt_mgr if args.resume else None,
                chunk=args.chunk_updates, eval_env=eval_env,
                eval_every=args.eval_every, eval_envs=args.eval_envs,
                eval_steps=args.eval_steps)
    if wandb_logger is not None:
        wandb_logger.close()
    elapsed = time.time() - t_start
    updates_run = (args.num_updates or cfg["NUM_UPDATES"]) \
        - (first_step[0] or 0)
    total = updates_run * cfg["NUM_STEPS"] * cfg["NUM_ENVS"]
    print(f"done: {total} env steps in {elapsed:.1f}s "
          f"({total / elapsed:.0f} steps/s)")


if __name__ == "__main__":
    main()
