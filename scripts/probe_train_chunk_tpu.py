"""Trainer-throughput probe for the round-4 operating points, one
process/window: IPPO update steps/s for (NUM_ENVS, ENV_CHUNKS) variants
under the certified capped engine (exact, trade_capture_cap=16), versus
the psort fully-exact default.

Usage: timeout 5400 python scripts/probe_train_chunk_tpu.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402

from bench import _preflight  # noqa: E402


def measure(engine, cap, n_envs, env_chunks, n_updates=12):
    from jaxmarl_hft_tpu.config.io import load_config
    from jaxmarl_hft_tpu.config.structs import MultiAgentConfig, replace_cfg
    from jaxmarl_hft_tpu.envs.marl import MarlEnv
    from jaxmarl_hft_tpu.rl.ippo import default_train_config, make_train

    ma = load_config("configs/2_player_fq_fqc_synth.json")
    ma = MultiAgentConfig(
        world_config=replace_cfg(ma.world_config, matching_engine=engine,
                                 trade_capture_cap=cap),
        agents=ma.agents,
        number_of_agents_per_type=ma.number_of_agents_per_type)
    env = MarlEnv(jax.random.PRNGKey(0), ma)
    cfg = default_train_config(
        NUM_ENVS=n_envs, NUM_STEPS=64, TOTAL_TIMESTEPS=n_envs * 64 * 1000,
        NUM_MINIBATCHES=4, UPDATE_EPOCHS=4, FC_DIM_SIZE=256,
        GRU_HIDDEN_DIM=256, ENV_CHUNKS=env_chunks)
    train = make_train(cfg, env)

    # warm with the SAME chunk length: the chunk program is cached per
    # length on the train object, so the timed call reuses it (timing a
    # different chunk length would time a fresh compile)
    t0 = time.time()
    train(jax.random.PRNGKey(0), num_updates=n_updates, chunk=n_updates)
    compile_t = time.time() - t0
    t0 = time.time()
    train(jax.random.PRNGKey(1), num_updates=n_updates, chunk=n_updates)
    dt = time.time() - t0
    sps = n_updates * n_envs * 64 / dt
    print(f"{engine} cap={cap} envs={n_envs} C={env_chunks}: "
          f"{sps:,.0f} env-steps/s (update {dt/n_updates*1e3:.0f} ms, "
          f"compile {compile_t:.0f}s)", flush=True)
    return sps


def main():
    if not _preflight(budget_s=1800):
        print("DEVICE UNAVAILABLE")
        return 1
    print(f"device={jax.devices()[0]}", flush=True)
    for engine, cap, envs, chunks in (
            ("exact", 16, 2048, 1),
            ("exact", 16, 2048, 2),
            ("exact", 16, 4096, 2),
            ("exact", 16, 4096, 4),
            ("psort", 0, 2048, 1),
    ):
        try:
            measure(engine, cap, envs, chunks)
        except Exception as e:  # noqa: BLE001
            print(f"{engine} envs={envs} C={chunks}: FAILED {e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
