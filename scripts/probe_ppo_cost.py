#!/usr/bin/env python
"""Decompose the IPPO update-step cost on the chip: rollout scan vs GAE vs
the PPO epoch loop (network passes + permutation gather + optimizer).

Each bucket is timed as its own warm-compiled jitted program on real
shapes, so the sum overstates the fused program (XLA overlaps across
buckets), but the ranking tells us where the update's ~1s/2048envs goes.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_env
from jaxmarl_hft_tpu.rl.ippo import default_train_config, make_train


def timeit(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    # discard the first post-compile execution too: it carries a one-time
    # ~20s overhead on this backend (BASELINE.md round-4 measurement trap)
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    # force a host copy of one scalar to defeat early block_until_ready
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--dtype", type=str, default="float32")
    ap.add_argument("--trade-cap", type=int, default=16)
    ap.add_argument("--env-chunks", type=int, default=1)
    ap.add_argument("--engine", type=str, default="exact")
    args = ap.parse_args()

    env = build_env(n_data_msg=100, engine=args.engine,
                    trade_capture_cap=args.trade_cap)
    cfg = default_train_config(
        NUM_ENVS=args.envs, NUM_STEPS=args.steps,
        TOTAL_TIMESTEPS=args.envs * args.steps * 100,
        NUM_MINIBATCHES=4, UPDATE_EPOCHS=4, FC_DIM_SIZE=256,
        GRU_HIDDEN_DIM=256, NETWORK_DTYPE=args.dtype,
        ENV_CHUNKS=args.env_chunks)
    train = make_train(cfg, env)
    rng = jax.random.PRNGKey(0)
    runner = train.init_state(rng)
    urs = (runner, jnp.asarray(0, jnp.int32))

    # full update step
    full = jax.jit(lambda u: train.update_step(u, None))
    t_full = timeit(full, urs)
    print(f"full _update_step: {t_full*1e3:.1f} ms "
          f"({args.envs*args.steps/t_full:.0f} env-steps/s)")

    # rollout+GAE only: same program with zero update epochs
    cfg0 = dict(cfg)
    cfg0["UPDATE_EPOCHS"] = 0
    train0 = make_train(cfg0, env)
    full0 = jax.jit(lambda u: train0.update_step(u, None))
    t_roll = timeit(full0, urs)
    print(f"rollout+GAE only (UPDATE_EPOCHS=0): {t_roll*1e3:.1f} ms")
    print(f"=> PPO epoch loop: ~{(t_full-t_roll)*1e3:.1f} ms")

    # epochs=1, minibatches=1 variant isolates gather vs pass count
    cfg1 = dict(cfg)
    cfg1["UPDATE_EPOCHS"] = 1
    cfg1["NUM_MINIBATCHES"] = 1
    train1 = make_train(cfg1, env)
    full1 = jax.jit(lambda u: train1.update_step(u, None))
    t_1x1 = timeit(full1, urs)
    print(f"1 epoch x 1 minibatch: {t_1x1*1e3:.1f} ms "
          f"(epoch-loop share {(t_1x1-t_roll)*1e3:.1f} ms; x16 = "
          f"{16*(t_1x1-t_roll)*1e3:.0f} ms if linear)")



if __name__ == "__main__":
    main()
