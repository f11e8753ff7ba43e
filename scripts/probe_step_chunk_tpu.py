"""Full-rollout env-batch chunking probe (follow-up to
probe_vmem_chunk_tpu.py, which found the isolated exact/cap16 scan runs 24%
faster when the 4096-env batch is split into 4 sequential lax.map chunks,
while psort is neutral).

Here the chunking is applied where production would apply it — around the
WHOLE vmapped env.step inside the driver-style rollout (bench.py harness) —
for both engines at several chunk counts, all in one process/window.
Per-env math is untouched (no cross-env reductions in env.step), so chunked
rollouts are bit-identical to unchunked; the checksum printed per variant
must agree within an engine.

Usage: timeout 5400 python scripts/probe_step_chunk_tpu.py [n_envs] [steps]
"""
import signal
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import build_env, _preflight  # noqa: E402


def bounded(label, seconds, fn):
    def _bail(s, f):
        raise TimeoutError(label)
    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(seconds)
    try:
        return fn()
    finally:
        signal.alarm(0)


def chunked_rollout(env, n_envs, n_steps, chunks, seed=0):
    params = env.default_params
    n_per_type = list(env.config.number_of_agents_per_type)

    reset_keys = jax.random.split(jax.random.PRNGKey(seed), n_envs)
    obs, state0 = jax.jit(jax.vmap(env.reset_env, in_axes=(0, None))
                          )(reset_keys, params)

    vstep = jax.vmap(env.step, in_axes=(0, 0, 0, None))

    def one_step(carry, key):
        state = carry
        ak, sk = jax.random.split(key)
        actions = []
        for i, sp in enumerate(env.action_spaces):
            n = n_per_type[i]
            a = jax.random.randint(jax.random.fold_in(ak, i),
                                   (n_envs, n), 0, sp.n)
            actions.append(a.squeeze(-1) if n == 1 else a)
        step_keys = jax.random.split(sk, n_envs)
        if chunks == 1:
            obs, state, rewards, dones, info = vstep(step_keys, state,
                                                     actions, params)
        else:
            resh = lambda x: x.reshape((chunks, n_envs // chunks)
                                       + x.shape[1:])
            args = jax.tree.map(resh, (step_keys, state, actions))
            out = jax.lax.map(lambda a: vstep(a[0], a[1], a[2], params),
                              args)
            unchunk = lambda x: x.reshape((n_envs,) + x.shape[2:])
            obs, state, rewards, dones, info = jax.tree.map(unchunk, out)
        return state, rewards[0][..., 0].sum()

    @jax.jit
    def rollout(state, key):
        keys = jax.random.split(key, n_steps)
        state, rs = jax.lax.scan(one_step, state, keys)
        return state, rs.sum()

    t0 = time.time()
    _, s = rollout(state0, jax.random.PRNGKey(1))
    checksum = float(np.asarray(s))
    compile_time = time.time() - t0
    runs = []
    for i in (2, 3, 4):
        t0 = time.time()
        _, s = rollout(state0, jax.random.PRNGKey(i))
        np.asarray(s)
        runs.append(n_envs * n_steps / (time.time() - t0))
    return sorted(runs)[1], compile_time, runs, checksum


def main():
    if not _preflight(budget_s=1800):
        print("DEVICE UNAVAILABLE")
        return 1
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    print(f"device={jax.devices()[0]} envs={n_envs} steps={n_steps}",
          flush=True)
    for eng, cap in (("exact", 16), ("psort", 0)):
        env = build_env(n_data_msg=100, engine=eng, trade_capture_cap=cap,
                        trade_mode="auto")
        for c in (1, 2, 4, 8):
            try:
                sps, ct, runs, cs = bounded(
                    f"{eng} C={c}", 1800,
                    lambda: chunked_rollout(env, n_envs, n_steps, c))
                print(f"{eng} cap={cap} C={c}: {sps:,.0f} env-steps/s "
                      f"(runs {[round(r/1000, 1) for r in runs]}k, "
                      f"compile {ct:.0f}s, checksum {cs:.1f})", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{eng} C={c}: FAILED {e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
