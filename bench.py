"""Throughput benchmark: 2-player MARL env (MM fixed_quants + Exec
fixed_quants_complex), random joint policy, warm-compiled rollout.

Mirrors the reference's Speed_test.py harness (compile-first, then timed
second run; metric = env-steps/s). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is value / 62_500 — the per-chip share of the 1M aggregate
env-steps/s target on a v5e-16 (BASELINE.md north star; the reference repo
publishes no numbers of its own).
"""
import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def build_env(n_data_msg=100, n_per_type=(1, 1), engine="exact",
              trade_capture_cap=16, trade_mode="compressed"):
    from jaxmarl_hft_tpu.config.structs import (ExecConfig, MMConfig,
                                                MultiAgentConfig, WorldConfig)
    from jaxmarl_hft_tpu.envs.marl import MarlEnv

    world = WorldConfig(
        synthetic_data=True, synthetic_n_msgs=400_000, ep_type="fixed_steps",
        episode_time=64, start_resolution=64,
        n_data_msg_per_step=n_data_msg, use_pickles_for_init=False,
        trade_capture_cap=trade_capture_cap, trade_capture_mode=trade_mode,
        matching_engine=engine)
    agents = (
        ("MarketMaking", MMConfig(action_space="fixed_quants",
                                  observation_space="basic",
                                  fixed_quant_value=1,
                                  auto_liquidate_threshold=0,
                                  unwind_price_penalty=0)),
        ("Execution", ExecConfig(action_space="fixed_quants_complex",
                                 observation_space="engineered",
                                 task_size=600)),
    )
    cfg = MultiAgentConfig(world_config=world, agents=agents,
                           number_of_agents_per_type=tuple(n_per_type))
    return MarlEnv(jax.random.PRNGKey(0), cfg)


def bench_rollout(env, n_envs, n_steps, seed=0, env_chunks=1):
    if env_chunks > 1 and n_envs % env_chunks:
        raise ValueError(f"env_chunks={env_chunks} must divide "
                         f"n_envs={n_envs}")
    params = env.default_params
    n_per_type = list(env.config.number_of_agents_per_type)

    reset_keys = jax.random.split(jax.random.PRNGKey(seed), n_envs)
    obs, state = jax.jit(jax.vmap(env.reset_env, in_axes=(0, None))
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
        if env_chunks > 1:
            # sequential lax.map over env-batch chunks: smaller per-chunk
            # working set pipelines better on TPU for the exact engine
            # (+12% at 4096 envs / C=2, scripts/probe_step_chunk_tpu.py);
            # per-env math is untouched, outputs bit-identical
            resh = lambda x: x.reshape((env_chunks, n_envs // env_chunks)
                                       + x.shape[1:])
            args = jax.tree.map(resh, (step_keys, state, actions))
            out = jax.lax.map(lambda a: vstep(a[0], a[1], a[2], params),
                              args)
            unchunk = lambda x: x.reshape((n_envs,) + x.shape[2:])
            obs, state, rewards, dones, info = jax.tree.map(unchunk, out)
        else:
            obs, state, rewards, dones, info = vstep(step_keys, state,
                                                     actions, params)
        # runtime exactness certificate: any env overflowing the trade cap
        # this step (cannot fire at the default cap = nTrades)
        return state, (rewards[0][..., 0].sum(),
                       jnp.any(info["world"]["trade_overflow"]))

    @jax.jit
    def rollout(state, key):
        keys = jax.random.split(key, n_steps)
        state, (rs, ovf) = jax.lax.scan(one_step, state, keys)
        return state, rs.sum(), jnp.any(ovf)

    import numpy as np

    # compile
    t0 = time.time()
    state2, s, ovf = rollout(state, jax.random.PRNGKey(1))
    np.asarray(s)
    compile_time = time.time() - t0

    # timed runs — force a host copy of the scalar output: on this backend
    # block_until_ready alone can return before the device finishes
    # (CLAUDE.md); measured equivalent here (190.9k vs 189.9k) but the host
    # copy is the trustworthy form. Median of 3 warm in-process runs: the
    # tunnel's window-to-window variance is ±20% but within-window runs are
    # tight; the median makes the official number robust to a single hiccup.
    runs = []
    overflowed = bool(np.asarray(ovf))
    for i in (2, 3, 4):
        t0 = time.time()
        _, s, ovf = rollout(state, jax.random.PRNGKey(i))
        np.asarray(s)
        runs.append(n_envs * n_steps / (time.time() - t0))
        overflowed |= bool(np.asarray(ovf))
    steps_per_sec = sorted(runs)[len(runs) // 2]
    return steps_per_sec, compile_time, runs, overflowed


def _preflight_once(timeout_s: int) -> bool:
    """One bounded device probe. The TPU tunnel can wedge so that every
    program hangs forever (see CLAUDE.md); a watchdog turns a hang into a
    clean failure instead of a hung process."""
    import signal

    def _bail(signum, frame):
        raise TimeoutError(f"device preflight timed out ({timeout_s}s)")

    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(timeout_s)
    try:
        import numpy as np
        dev = jax.devices()[0]
        np.asarray(jax.jit(lambda a: (a @ a).sum())(jnp.ones((64, 64))))
        print(f"# preflight ok on {dev}", file=sys.stderr)
        return True
    except Exception as e:   # noqa: BLE001 - any failure means no device
        print(f"# preflight FAILED: {e}", file=sys.stderr)
        return False
    finally:
        signal.alarm(0)


def _preflight(budget_s: int = 600) -> bool:
    """Retry the probe with growing timeouts until it passes or the budget
    is spent. A transient tunnel outage (observed: minutes-long) must not
    zero the round's official metric; only a persistently dead device may.
    """
    schedule = [60, 120, 180, 240]  # per-attempt watchdogs
    spent = 0.0
    for i, t in enumerate(schedule):
        t = min(t, max(15, int(budget_s - spent)))
        t0 = time.time()
        if _preflight_once(t):
            return True
        spent += time.time() - t0
        if spent >= budget_s:
            break
        pause = min(30, budget_s - spent)
        print(f"# preflight retry {i + 1} in {pause:.0f}s "
              f"(spent {spent:.0f}s of {budget_s}s budget)", file=sys.stderr)
        time.sleep(pause)
        spent += pause
    return False


def _measure(args, engine, trade_cap, trade_mode, timeout_s=1500,
             env_chunks=1, n_envs=None):
    """Build + bench one configuration under an alarm watchdog (a wedged
    compile through the tunnel must not zero the whole bench — see
    CLAUDE.md). Returns (steps/s, runs, overflowed) or None on timeout."""
    import signal

    def _bail(signum, frame):
        raise TimeoutError(f"measurement timed out ({timeout_s}s)")

    old = signal.signal(signal.SIGALRM, _bail)
    signal.alarm(timeout_s)
    try:
        n_envs = n_envs or args.envs
        env = build_env(n_data_msg=args.n_data_msg, engine=engine,
                        trade_capture_cap=trade_cap, trade_mode=trade_mode)
        sps, compile_time, runs, ovf = bench_rollout(
            env, n_envs, args.steps, env_chunks=env_chunks)
        print(f"# {engine} cap={trade_cap} envs={n_envs} "
              f"chunks={env_chunks}: "
              f"runs={[round(r / 1000, 1) for r in runs]}k "
              f"overflow={ovf} compile={compile_time:.1f}s",
              file=sys.stderr)
        return sps, runs, ovf
    except Exception as e:  # noqa: BLE001 - report what we have
        print(f"# measurement ({engine}, cap={trade_cap}) FAILED: {e}",
              file=sys.stderr)
        return None
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=None,
                    help="env batch (default: the measured-best operating "
                         "point for the mode/engine — 8192 for the "
                         "certified/capped measurement, 4096 for psort; "
                         "the certified mode's psort side always runs at "
                         "min(envs, 4096) unchunked)")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--n-data-msg", type=int, default=100)
    ap.add_argument("--mode", type=str, default="certified",
                    choices=["certified", "single"],
                    help="certified (default): measure the production "
                         "operating point — exact engine + trade cap 16 with "
                         "the runtime exactness certificate (bit-exact "
                         "unless the overflow flag fires, which is checked "
                         "every step) — AND the cap-independent fully-exact "
                         "psort backend in the same process/window. "
                         "single: bench only --engine/--trade-cap")
    ap.add_argument("--engine", type=str, default="psort",
                    choices=["exact", "sorted", "psort"],
                    help="matching backend for --mode single")
    ap.add_argument("--trade-cap", type=int, default=0,
                    help="max fills recorded per single message (0 = "
                         "nTrades, fully exact; the psort engine is "
                         "cap-independent). --mode single only")
    ap.add_argument("--trade-mode", type=str, default="auto",
                    choices=["auto", "compressed", "inscan"],
                    help="exact-engine trade-buffer assembly (bit-identical "
                         "perf knob; auto = fastest for the cap)")
    ap.add_argument("--env-chunks", type=int, default=None,
                    help="split the env batch into N sequential lax.map "
                         "chunks per step (bit-identical per env; the "
                         "exact engine measures best at 8192 envs / C=4 = "
                         "~222k, psort prefers 4096 unchunked — "
                         "probe_step_chunk_tpu.py). Default: the "
                         "measured-best for the mode/engine; the certified "
                         "mode's psort side always runs unchunked")
    args = ap.parse_args()
    # resolve operating-point defaults (BASELINE.md round-4): capped exact
    # peaks at 8192 envs / 4 chunks; psort at 4096 unchunked
    capped_single = args.mode == "single" and (args.engine != "psort"
                                               and args.trade_cap != 0)
    if args.envs is None:
        args.envs = 8192 if (args.mode == "certified" or capped_single) \
            else 4096
    if args.env_chunks is None:
        args.env_chunks = 4 if (args.mode == "certified" or capped_single) \
            else 1

    if not _preflight():
        print(json.dumps({
            "metric": "env_steps_per_sec", "value": 0,
            "unit": "env-steps/s/chip (DEVICE UNAVAILABLE - preflight "
                    "timed out; see BASELINE.md for recorded measurements)",
            "vs_baseline": 0}))
        return

    target_per_chip = 1_000_000 / 16  # BASELINE.md: 1M aggregate on v5e-16

    if args.mode == "single":
        res = _measure(args, args.engine, args.trade_cap, args.trade_mode,
                       timeout_s=3000, env_chunks=args.env_chunks)
        if res is None:
            print(json.dumps({
                "metric": "env_steps_per_sec", "value": 0,
                "unit": "env-steps/s/chip (measurement failed)",
                "vs_baseline": 0}))
            return
        sps, runs, ovf = res
        print(json.dumps({
            "metric": "env_steps_per_sec",
            "value": round(sps, 1),
            "unit": (f"env-steps/s/chip (2-player MM+exec, 112 msgs/step, "
                     f"{args.engine} engine, "
                     f"{'FULLY exact' if args.trade_cap == 0 else 'cap=' + str(args.trade_cap)}"
                     f" trade capture; median of 3 warm runs)"),
            "vs_baseline": round(sps / target_per_chip, 3),
            "trade_overflow_fired": ovf,
            "runs": [round(r, 1) for r in runs],
        }))
        return

    # certified mode: the production operating point first (exact engine,
    # cap=16, per-step runtime exactness certificate), then the
    # cap-independent fully-exact psort default — same process, same tunnel
    # window, so the two numbers are comparable (CLAUDE.md: window-to-window
    # throughput varies ±20%)
    cert = _measure(args, "exact", 16, "auto", env_chunks=args.env_chunks)
    # psort's best operating point is 4096 envs unchunked (BASELINE.md
    # round-4: its carry hits the VMEM cliff beyond 4096 and chunking
    # costs it ~10%)
    ps = _measure(args, "psort", 0, "auto", n_envs=min(args.envs, 4096))

    cert_clean = cert is not None and not cert[2]
    if cert_clean:
        sps, runs, _ = cert
        unit = (f"env-steps/s/chip (2-player MM+exec, 112 msgs/step, exact "
                f"engine cap=16, env-chunks={args.env_chunks}, "
                "runtime-CERTIFIED bit-exact trade capture — "
                "per-step overflow flag stayed False across all timed "
                "rollouts, so output is bit-identical to fully-exact; "
                "median of 3 warm runs"
                + (f"; psort fully-exact same-window = {ps[0]:.0f}"
                   if ps else "") + ")")
    elif ps is not None:
        # certificate fired or capped run failed: fully-exact psort is the
        # honest headline
        sps, runs, _ = ps
        unit = ("env-steps/s/chip (2-player MM+exec, 112 msgs/step, psort "
                "engine, FULLY exact trade capture; median of 3 warm runs; "
                "capped-mode certificate "
                + ("FIRED" if cert else "unavailable") + " this window)")
    else:
        print(json.dumps({
            "metric": "env_steps_per_sec", "value": 0,
            "unit": "env-steps/s/chip (all measurements failed; see "
                    "BASELINE.md for recorded numbers)",
            "vs_baseline": 0}))
        return

    print(json.dumps({
        "metric": "env_steps_per_sec",
        "value": round(sps, 1),
        "unit": unit,
        "vs_baseline": round(sps / target_per_chip, 3),
        # Derived from the branch actually taken: the capped run's runtime
        # certificate stayed clean (bit-identical to fully exact), or the
        # headline fell back to psort at cap=nTrades (fully exact).
        "certified_exact": bool(cert_clean or ps is not None),
        "trade_overflow_fired": bool(cert[2]) if cert else None,
        "runs": [round(r, 1) for r in runs],
        "psort_fully_exact": round(ps[0], 1) if ps else None,
        "psort_runs": [round(r, 1) for r in ps[1]] if ps else None,
        "certified_cap16": round(cert[0], 1) if cert else None,
    }))
    print(f"# envs={args.envs} steps={args.steps} device={jax.devices()[0]}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
