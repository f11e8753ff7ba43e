"""Multi-process (multi-host-shaped) training equivalence.

Spawns scripts/multihost_smoke.py twice:
  * 2 processes x 4 virtual CPU devices, jax.distributed + Gloo collectives
    crossing the process boundary (the DCN code path of a TPU pod);
  * 1 process x 8 virtual CPU devices (the single-controller control).

Both run the FULL IPPO trainer over the same 8-device global mesh and must
produce bit-identical per-update losses — the multi-host story the reference
lacks entirely (SURVEY.md §2 parallelism inventory / §5 distributed
communication backend)."""
import json
import math
import os
import subprocess
import sys

SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "multihost_smoke.py")


def _run(nprocs, devices_per_proc, env_chunks=1):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run(
        [sys.executable, SCRIPT, "--nprocs", str(nprocs),
         "--devices-per-proc", str(devices_per_proc),
         "--num-envs", "16", "--updates", "2",
         "--env-chunks", str(env_chunks)],
        capture_output=True, text=True, timeout=900, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_two_process_training_matches_single_process():
    multi = _run(2, 4)
    single = _run(1, 8)
    assert multi["losses"] == single["losses"], (multi, single)
    assert len(multi["losses"]) == 2
    assert all(all(math.isfinite(l) for l in per_type)
               for per_type in multi["losses"])


def test_pod_shape_2x8_matches_1x16():
    """v5e-16 north-star topology rehearsal: 2 hosts x 8 chips = 16 global
    devices. The 2-process run (collectives crossing the process boundary,
    the DCN split of a real pod) must be bit-identical to the
    single-process 16-device mesh."""
    multi = _run(2, 8)
    single = _run(1, 16)
    assert multi["losses"] == single["losses"], (multi, single)


def test_two_process_chunked_matches_unchunked():
    """Round-5 shard-local ENV_CHUNKS composes across the PROCESS boundary
    too: a 2-process mesh run with per-shard env chunking is bit-identical
    to the unchunked single-process mesh run (chunking never moves an env
    across devices, so the cross-process collectives see identical
    values)."""
    multi = _run(2, 4, env_chunks=2)
    single = _run(1, 8)
    assert multi["losses"] == single["losses"], (multi, single)
