"""Trainer-throughput probe for the round-4 operating points, one
process/window: steady-state IPPO update time for (NUM_ENVS, ENV_CHUNKS)
variants under the certified capped engine (exact, trade_capture_cap=16).

METHODOLOGY (learned the hard way): time the jitted single update step in
a Python loop AFTER one discarded warm execution. On this backend the
FIRST execution of a freshly compiled program carries a one-time ~20s
overhead (observed 22.3s then 0.73s steady for the same program) — any
short timed run that includes it reads 3-4x slow. The earlier version of
this probe timed 12-update chunk programs whose first execution absorbed
that anomaly and mis-read a 3.6x "regression" that an isolated-step
A/B against the round-3 tree disproved.

Round-4 steady-state record (2026-08-21, one window, min of 4 warm
updates, exact/cap16, GRU/FC 256, 4x4 PPO):
    2048 envs C=1: 720 ms/update = 182.0k env-steps/s   (r1 record: 179.4k)
    2048 envs C=2: 764 ms       = 171.5k
    4096 envs C=1: 1699 ms      = 154.3k                (r1 record: 155.3k)
    4096 envs C=4: 1481 ms      = 177.0k  (+15% from chunking)

Usage: timeout 3600 python scripts/probe_train_chunk_tpu.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import _preflight  # noqa: E402


def measure(env, n_envs, env_chunks, donate=True, dtype="float32",
            tag=""):
    from jaxmarl_hft_tpu.rl.ippo import default_train_config, make_train

    cfg = default_train_config(
        NUM_ENVS=n_envs, NUM_STEPS=64, TOTAL_TIMESTEPS=n_envs * 64 * 1000,
        NUM_MINIBATCHES=4, UPDATE_EPOCHS=4, FC_DIM_SIZE=256,
        GRU_HIDDEN_DIM=256, ENV_CHUNKS=env_chunks, NETWORK_DTYPE=dtype)
    train = make_train(cfg, env)
    rs = train.init_state(jax.random.PRNGKey(0))
    urs = ((tuple(rs[0]), rs[1], list(rs[2]), list(rs[3]), list(rs[4]),
            rs[5]), jnp.asarray(0, jnp.int32))
    step = jax.jit(lambda u: train.update_step(u, None),
                   donate_argnums=(0,) if donate else ())
    out, m = step(urs)
    np.asarray(m["loss"][0]["total_loss"])      # compile
    out, m = step(out)
    np.asarray(m["loss"][0]["total_loss"])      # discard first-exec anomaly
    dts = []
    for _ in range(4):
        t0 = time.time()
        out, m = step(out)
        np.asarray(m["loss"][0]["total_loss"])
        dts.append(time.time() - t0)
    dt = min(dts)
    print(f"envs={n_envs} C={env_chunks} donate={int(donate)} "
          f"dtype={dtype}{tag}: {dt*1e3:.0f} ms/update = "
          f"{n_envs*64/dt/1e3:.1f}k env-steps/s "
          f"{['%.0f' % (d*1e3) for d in dts]}", flush=True)


def main():
    if not _preflight(budget_s=1800):
        print("DEVICE UNAVAILABLE")
        return 1
    from jaxmarl_hft_tpu.config.io import load_config
    from jaxmarl_hft_tpu.config.structs import MultiAgentConfig, replace_cfg
    from jaxmarl_hft_tpu.envs.marl import MarlEnv

    ma = load_config("configs/2_player_fq_fqc_synth.json")
    ma = MultiAgentConfig(
        world_config=replace_cfg(ma.world_config, matching_engine="exact",
                                 trade_capture_cap=16),
        agents=ma.agents,
        number_of_agents_per_type=ma.number_of_agents_per_type)
    env = MarlEnv(jax.random.PRNGKey(0), ma)
    print(f"device={jax.devices()[0]}", flush=True)
    grid = [
        # round-5 sweep: chunk variants x donation x network dtype at the
        # two training operating points (BASELINE.md round-4 table)
        dict(n_envs=4096, env_chunks=4),
        dict(n_envs=4096, env_chunks=2),
        dict(n_envs=4096, env_chunks=4, donate=False),
        dict(n_envs=4096, env_chunks=4, dtype="bfloat16"),
        dict(n_envs=4096, env_chunks=2, dtype="bfloat16"),
        dict(n_envs=2048, env_chunks=1),
        dict(n_envs=2048, env_chunks=1, dtype="bfloat16"),
        # 8192/C4 is the certified ROLLOUT best point (221.7k, official
        # bench default) — the epoch phase amortises over 2x the batch
        dict(n_envs=8192, env_chunks=4),
        dict(n_envs=8192, env_chunks=4, dtype="bfloat16"),
    ]
    for kw in grid:
        try:
            measure(env, **kw)
        except Exception as e:  # noqa: BLE001
            print(f"{kw}: FAILED {e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
