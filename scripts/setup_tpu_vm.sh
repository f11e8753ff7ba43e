#!/usr/bin/env bash
# TPU-VM setup for jaxmarl_hft_tpu — the launch-parity counterpart of the
# reference's Dockerfile/Dockerfile_GB10 (CUDA images). TPU VMs are
# host-native (the TPU runtime lives on the VM; containers need privileged
# /dev/accel passthrough and buy nothing here), so "the image" is this
# idempotent setup script + pyproject install.
#
#   gcloud compute tpus tpu-vm create my-vm --zone=... \
#       --accelerator-type=v5litepod-8 --version=v2-alpha-tpuv5-lite
#   gcloud compute tpus tpu-vm ssh my-vm --zone=... \
#       --command="bash -s" < scripts/setup_tpu_vm.sh
#
# Multi-host pods: run on every worker (--worker=all); jax.distributed is
# initialised by the trainer (parallel/mesh.initialize_multihost) from the
# TPU metadata, no extra flags needed.
set -euo pipefail

REPO_DIR="${REPO_DIR:-$HOME/jaxmarl_hft_tpu}"
PYTHON="${PYTHON:-python3}"

if ! $PYTHON -c 'import jax' 2>/dev/null; then
    $PYTHON -m pip install -U pip
    # libtpu-pinned JAX (same pin as requirements_tpu.txt)
    $PYTHON -m pip install -r "$REPO_DIR/requirements_tpu.txt"
fi

$PYTHON -m pip install -e "$REPO_DIR"

# build the native C++ LOBSTER CSV parser (also auto-built on first use)
make -C "$REPO_DIR" native

# smoke: one jitted matmul on the TPU + a 2-step env rollout
$PYTHON - <<'PY'
import jax, jax.numpy as jnp
devs = jax.devices()
print("devices:", devs)
assert devs[0].platform == "tpu", (
    f"setup smoke found platform {devs[0].platform!r}, not TPU — a "
    "pre-existing CPU-only jax masked the pinned install; rerun with the "
    "stock jax removed (pip uninstall jax jaxlib) or install "
    "requirements_tpu.txt manually")
x = jnp.ones((256, 256))
print("matmul ok:", float((x @ x).sum()))
from jaxmarl_hft_tpu.config.structs import (ExecConfig, MMConfig,
                                            MultiAgentConfig, WorldConfig)
from jaxmarl_hft_tpu.envs.marl import MarlEnv
world = WorldConfig(synthetic_data=True, synthetic_n_msgs=40_000,
                    ep_type="fixed_steps", episode_time=8,
                    start_resolution=8, n_data_msg_per_step=20,
                    use_pickles_for_init=False)
agents = (("MarketMaking", MMConfig(action_space="fixed_quants",
                                    observation_space="basic",
                                    fixed_quant_value=1)),
          ("Execution", ExecConfig(action_space="fixed_quants_complex",
                                   observation_space="engineered",
                                   task_size=100)))
env = MarlEnv(jax.random.PRNGKey(0),
              MultiAgentConfig(world_config=world, agents=agents,
                               number_of_agents_per_type=(1, 1)))
p = env.default_params
keys = jax.random.split(jax.random.PRNGKey(1), 8)
obs, st = jax.vmap(env.reset_env, in_axes=(0, None))(keys, p)
acts = [jnp.zeros((8,), jnp.int32)] * 2
o, st, r, d, i = jax.vmap(env.step, in_axes=(0, 0, 0, None))(keys, st,
                                                             acts, p)
print("env step ok:", [float(x.sum()) for x in r])
PY
echo "setup complete"
