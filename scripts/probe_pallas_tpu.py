"""Staged on-TPU validation + timing of the Pallas book-scan kernel.

The TPU tunnel can be wedged by a bad kernel (CLAUDE.md); this script
escalates shape sizes one stage at a time, each stage bounded by SIGALRM,
with a plain-matmul health probe between stages. Prints one line per stage.

Usage: timeout 1800 python scripts/probe_pallas_tpu.py [--max-stage N]
"""
import argparse
import os
import signal
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
import numpy as np


class StageTimeout(Exception):
    pass


def _alarm(sig, frame):
    raise StageTimeout()


def bounded(label, seconds, fn):
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(seconds)
    t0 = time.time()
    try:
        out = fn()
        dt = time.time() - t0
        print(f"[{label}] OK in {dt:.1f}s", flush=True)
        return out
    except StageTimeout:
        print(f"[{label}] TIMED OUT after {seconds}s — device likely wedged",
              flush=True)
        sys.exit(2)
    finally:
        signal.alarm(0)


def health():
    def go():
        x = jnp.ones((128, 128))
        return float(np.asarray(jax.jit(lambda a: (a @ a).sum())(x)))
    bounded("health-matmul", 90, go)


def batch_streams(n_envs, n_msgs, seed0=0):
    sys.path.insert(0, os.path.join(_ROOT, "tests"))
    from reference_oracle import init_book_messages, random_message_stream
    streams = []
    for i in range(n_envs):
        rng = np.random.default_rng(seed0 + i)
        streams.append(np.concatenate([init_book_messages(rng),
                                       random_message_stream(rng, n_msgs)]))
    return jnp.asarray(np.stack(streams), jnp.int32)


def run_engine(mod_scan, cfg, msgs_b, n_steps):
    from jaxmarl_hft_tpu.lob import engine
    n_envs = msgs_b.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(7), n_envs)
    fresh = (engine.init_orderside(cfg.nOrders),
             engine.init_orderside(cfg.nOrders),
             engine.init_trades(cfg.nTrades))
    state_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_envs,) + x.shape), fresh)
    fn = jax.jit(jax.vmap(
        lambda k, m, s: mod_scan(cfg, k, m, s, n_steps)))
    out = fn(keys, msgs_b, state_b)
    jax.block_until_ready(out)
    return out, fn, (keys, msgs_b, state_b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-stage", type=int, default=4)
    args = ap.parse_args()

    from jaxmarl_hft_tpu.config.structs import LobConfig
    from jaxmarl_hft_tpu.lob import engine
    from jaxmarl_hft_tpu.ops import book_scan

    cfg = LobConfig(trade_capture_cap=16)
    print(f"backend={jax.default_backend()} dev={jax.devices()[0]}",
          flush=True)
    health()

    # Stage 1: one batch tile, 8 messages after init (tiny kernel).
    if args.max_stage >= 1:
        msgs_b = batch_streams(8, 8, seed0=100)
        n_steps = msgs_b.shape[1]
        (pal, _, _) = bounded(
            "stage1-pallas-tiny", 600,
            lambda: run_engine(book_scan.scan_messages_save_bidask,
                               cfg, msgs_b, n_steps))
        health()
        (ex, _, _) = bounded(
            "stage1-exact", 600,
            lambda: run_engine(engine.scan_messages_save_bidask,
                               cfg, msgs_b, n_steps))
        pal_state, (pal_a, pal_b) = pal
        ex_state, (ex_a, ex_b) = ex
        np.testing.assert_array_equal(np.asarray(pal_a), np.asarray(ex_a))
        np.testing.assert_array_equal(np.asarray(pal_b), np.asarray(ex_b))
        np.testing.assert_array_equal(np.asarray(pal_state[2]),
                                      np.asarray(ex_state[2]))
        def canon(side):
            a = np.asarray(side)
            return np.stack([e[np.lexsort(e.T[::-1])] for e in a])
        np.testing.assert_array_equal(canon(pal_state[0]), canon(ex_state[0]))
        np.testing.assert_array_equal(canon(pal_state[1]), canon(ex_state[1]))
        print("[stage1] pallas == exact (canonical) on TPU", flush=True)

    # Stage 2: production-like message count (112), small batch.
    if args.max_stage >= 2:
        msgs_b = batch_streams(16, 100, seed0=200)
        n_steps = msgs_b.shape[1]
        (pal, _, _) = bounded(
            "stage2-pallas-112msg", 900,
            lambda: run_engine(book_scan.scan_messages_save_bidask,
                               cfg, msgs_b, n_steps))
        health()
        (ex, _, _) = bounded(
            "stage2-exact", 900,
            lambda: run_engine(engine.scan_messages_save_bidask,
                               cfg, msgs_b, n_steps))
        pal_state, (pal_a, pal_b) = pal
        ex_state, (ex_a, ex_b) = ex
        np.testing.assert_array_equal(np.asarray(pal_a), np.asarray(ex_a))
        np.testing.assert_array_equal(np.asarray(pal_b), np.asarray(ex_b))
        np.testing.assert_array_equal(np.asarray(pal_state[2]),
                                      np.asarray(ex_state[2]))
        print("[stage2] pallas == exact on TPU at 112 msgs", flush=True)

    # Stage 3: timing head-to-head at bench scale (engine scan only).
    if args.max_stage >= 3:
        msgs_b = batch_streams(2048, 100, seed0=300)
        n_steps = msgs_b.shape[1]
        for name, scan in (("pallas", book_scan.scan_messages_save_bidask),
                           ("exact", engine.scan_messages_save_bidask)):
            out, fn, args_ = bounded(
                f"stage3-{name}-compile", 900,
                lambda s=scan: run_engine(s, cfg, msgs_b, n_steps))
            def timed(fn=fn, args_=args_):
                t0 = time.time()
                o = fn(*args_)
                np.asarray(jax.tree.leaves(o)[0][0])
                jax.block_until_ready(o)
                return time.time() - t0
            dts = [bounded(f"stage3-{name}-run{i}", 300, timed)
                   for i in range(3)]
            dt = min(dts)
            msgs_per_s = msgs_b.shape[0] * n_steps / dt
            print(f"[stage3] {name}: {dt*1e3:.1f} ms for "
                  f"{msgs_b.shape[0]}x{n_steps} msgs = "
                  f"{msgs_per_s/1e6:.2f} M msgs/s", flush=True)
            health()

    # Stage 4: full env bench with matching_engine='pallas'.
    if args.max_stage >= 4:
        sys.path.insert(0, ".")
        import bench
        env = bench.build_env(engine="pallas")
        def go():
            return bench.bench_rollout(env, 1024, 8)
        sps, compile_time, elapsed = bounded("stage4-env-pallas", 1200, go)
        print(f"[stage4] pallas env bench: {sps:,.0f} env-steps/s "
              f"(compile {compile_time:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
