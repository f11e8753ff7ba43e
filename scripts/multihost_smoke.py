#!/usr/bin/env python
"""Multi-host (multi-process) IPPO smoke: the DCN story the reference lacks.

Runs the FULL training loop (make_train + mesh) under
``jax.distributed.initialize`` with N processes x D virtual CPU devices per
process — one global 1-D data mesh, env batch sharded across processes,
params replicated, gradient all-reduce crossing the process boundary (Gloo
on CPU; ICI/DCN collectives on a real TPU pod, same code). The reference's
distribution ceiling is single-host ``jax.pmap``
(ippo_rnn_JAXMARL_pmap.py:788-793); this validates the code path that
replaces it, end-to-end, without TPU pod hardware.

Driver mode (default): spawns itself once per rank, waits, and asserts every
rank reports bit-identical losses.

    python scripts/multihost_smoke.py --nprocs 2 --devices-per-proc 4
    python scripts/multihost_smoke.py --nprocs 1 --devices-per-proc 8
      (single-process control: same global device count, no distributed init
       — losses must match the multi-process run bit-for-bit)

Rank mode (spawned internally): --rank R set.
"""
import argparse
import json
import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_rank(args):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices_per_proc} "
        + os.environ.get("XLA_FLAGS", ""))
    sys.path.insert(0, ROOT)
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    if args.nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.nprocs, process_id=args.rank)
        assert jax.process_count() == args.nprocs
    n_global = args.nprocs * args.devices_per_proc
    assert len(jax.devices()) == n_global, (len(jax.devices()), n_global)

    from jaxmarl_hft_tpu.config.structs import (ExecConfig, MMConfig,
                                                MultiAgentConfig, WorldConfig)
    from jaxmarl_hft_tpu.envs.marl import MarlEnv
    from jaxmarl_hft_tpu.parallel.mesh import make_mesh
    from jaxmarl_hft_tpu.rl.ippo import default_train_config, make_train

    world = WorldConfig(
        synthetic_data=True, synthetic_n_msgs=10_000, ep_type="fixed_steps",
        episode_time=8, start_resolution=8, n_data_msg_per_step=4,
        use_pickles_for_init=False)
    agents = (("MarketMaking", MMConfig(action_space="fixed_quants",
                                        observation_space="basic",
                                        fixed_quant_value=1)),
              ("Execution", ExecConfig(action_space="fixed_quants_complex",
                                       observation_space="engineered",
                                       task_size=60)))
    cfg = MultiAgentConfig(world_config=world, agents=agents,
                           number_of_agents_per_type=(1, 1))
    env = MarlEnv(jax.random.PRNGKey(0), cfg)
    tc = default_train_config(
        NUM_ENVS=args.num_envs, NUM_STEPS=8,
        TOTAL_TIMESTEPS=args.num_envs * 8 * args.updates,
        NUM_MINIBATCHES=2, UPDATE_EPOCHS=2, FC_DIM_SIZE=32,
        GRU_HIDDEN_DIM=32, ENV_CHUNKS=args.env_chunks)
    train = make_train(tc, env, mesh=make_mesh())
    out = train(jax.random.PRNGKey(0), num_updates=args.updates)
    losses = [[float(l["total_loss"]) for l in m["loss"]]
              for m in out["metrics"]]
    print("RESULT " + json.dumps({"rank": args.rank, "losses": losses}),
          flush=True)


def run_driver(args):
    if args.nprocs > 1 and args.port == 0:
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        args.port = s.getsockname()[1]
        s.close()
    procs = []
    for r in range(args.nprocs):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--rank", str(r), "--nprocs", str(args.nprocs),
               "--port", str(args.port),
               "--devices-per-proc", str(args.devices_per_proc),
               "--num-envs", str(args.num_envs),
               "--updates", str(args.updates),
               "--env-chunks", str(args.env_chunks)]
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    results = {}
    try:
        for r, p in enumerate(procs):
            out, _ = p.communicate(timeout=args.timeout)
            if p.returncode != 0:
                print(out)
                raise SystemExit(f"rank {r} failed (exit {p.returncode})")
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    rec = json.loads(line[len("RESULT "):])
                    results[rec["rank"]] = rec["losses"]
    finally:
        # a failed/timed-out rank must not leave peers blocked forever in
        # jax.distributed collectives holding the coordinator port
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert len(results) == args.nprocs, results
    first = results[0]
    for r, losses in results.items():
        assert losses == first, f"rank {r} diverged: {losses} != {first}"
    print(json.dumps({"nprocs": args.nprocs,
                      "devices_per_proc": args.devices_per_proc,
                      "updates": args.updates, "losses": first}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--num-envs", type=int, default=16)
    ap.add_argument("--updates", type=int, default=2)
    ap.add_argument("--env-chunks", type=int, default=1)
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()
    if args.rank is None:
        run_driver(args)
    else:
        run_rank(args)


if __name__ == "__main__":
    main()
