#!/usr/bin/env python
"""Head-to-head rollout throughput: UPSTREAM reference framework vs ours,
same TPU chip, same LOBSTER CSVs, same 2-player config, same harness.

The reference (biiiipy/JaxMARL-HFT) is pure JAX, so it runs on TPU
unmodified — this measures what a straight port buys vs the TPU-first
redesign (branchless SoA engine, no while-loop matching, no scatters).
Both envs are bit-identical in behaviour (tests/test_env_vs_reference_live
.py), so the comparison is pure implementation.

Usage:
    python scripts/bench_vs_reference.py --envs 512 --steps 16 \
        [--skip-reference] [--trade-cap 16]
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax
import jax.numpy as jnp
import numpy as np

MM_OVR = dict(action_space="fixed_quants", observation_space="basic",
              fixed_quant_value=1)
EXEC_OVR = dict(action_space="fixed_quants_complex",
                observation_space="engineered", task="sell", task_size=100)
N_ACTIONS = [10, 13]


def rollout_throughput(env, params, n_envs, n_steps, label):
    """Warm-compiled random-action rollout; identical harness for both."""
    reset_keys = jax.random.split(jax.random.PRNGKey(0), n_envs)
    obs, state = jax.jit(jax.vmap(env.reset_env, in_axes=(0, None))
                         )(reset_keys, params)

    def one_step(carry, key):
        state = carry
        ak, sk = jax.random.split(key)
        actions = [jax.random.randint(jax.random.fold_in(ak, i),
                                      (n_envs,), 0, n)
                   for i, n in enumerate(N_ACTIONS)]
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

    t0 = time.time()
    s2, _ = rollout(state, jax.random.PRNGKey(1))
    jax.block_until_ready(s2)
    compile_s = time.time() - t0

    t0 = time.time()
    s3, acc = rollout(state, jax.random.PRNGKey(2))
    jax.block_until_ready(s3)
    np.asarray(acc)
    elapsed = time.time() - t0
    sps = n_envs * n_steps / elapsed
    print(f"{label:28s} {sps:12,.0f} env-steps/s  "
          f"(run {elapsed:.2f}s, compile {compile_s:.0f}s)", flush=True)
    return sps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=512)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--n-msgs", type=int, default=60_000)
    ap.add_argument("--data-dir", type=str, default="runs/h2h_data")
    ap.add_argument("--trade-cap", type=int, default=0,
                    help="our env's trade_capture_cap (0 = exact, matching "
                         "the reference's semantics everywhere)")
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--skip-ours", action="store_true")
    args = ap.parse_args()

    from reference_env import (make_reference_env, reference_available,
                               write_lobster_csvs)

    root = os.path.abspath(args.data_dir)
    data_root = os.path.join(root, "data")
    marker = os.path.join(data_root, f".n{args.n_msgs}")
    if not os.path.exists(marker):
        write_lobster_csvs(data_root, seed=3, n=args.n_msgs)
        open(marker, "w").close()
        print(f"wrote {args.n_msgs}-msg LOBSTER CSV pair under {data_root}")

    print(f"device={jax.devices()[0]} envs={args.envs} steps={args.steps} "
          f"(112 msgs/env-step)", flush=True)
    results = {}

    if not args.skip_ours:
        from jaxmarl_hft_tpu.config.structs import (ExecConfig, MMConfig,
                                                    MultiAgentConfig,
                                                    WorldConfig)
        from jaxmarl_hft_tpu.envs.marl import MarlEnv
        world = WorldConfig(
            synthetic_data=False, dataPath=data_root,
            alphatradePath=os.path.join(root, "our_at"), stock="TEST",
            timePeriod="2024", ep_type="fixed_steps", episode_time=64,
            start_resolution=64, n_data_msg_per_step=100,
            window_selector=-1, use_pickles_for_init=True,
            trade_capture_cap=args.trade_cap)
        ours = MarlEnv(jax.random.PRNGKey(0), MultiAgentConfig(
            world_config=world,
            agents=(("MarketMaking", MMConfig(**MM_OVR)),
                    ("Execution", ExecConfig(**EXEC_OVR))),
            number_of_agents_per_type=(1, 1)))
        cap = "exact" if args.trade_cap == 0 else f"cap={args.trade_cap}"
        results["ours"] = rollout_throughput(
            ours, ours.default_params, args.envs, args.steps,
            f"ours ({cap})")

    if not args.skip_reference:
        if not reference_available():
            raise SystemExit("reference mount unavailable")
        ref = make_reference_env(
            data_root, os.path.join(root, "ref_at"),
            episode_time=64, start_resolution=64, n_data_msg_per_step=100,
            window_selector=-1, mm_overrides=MM_OVR,
            exec_overrides=EXEC_OVR, key=jax.random.PRNGKey(0))
        results["reference"] = rollout_throughput(
            ref, ref.default_params, args.envs, args.steps, "reference")

    if "ours" in results and "reference" in results:
        print(f"speedup: {results['ours'] / results['reference']:.1f}x",
              flush=True)


if __name__ == "__main__":
    main()
