"""Engine-scan floor analysis on the current backend.

Times the message scan at bench scale for message mixes of increasing cost
(noop-only, adds-only, adds+cancels, matching-heavy) for each backend, to
locate where the per-step milliseconds go: the scan-carry floor vs dispatch
vs matching compute.

Usage: timeout 3600 python scripts/probe_engine_floor.py [n_envs] [engines..]
"""
import os
import signal
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import jax
import jax.numpy as jnp
import numpy as np


def bounded(label, seconds, fn):
    def _bail(s, f):
        raise TimeoutError(label)
    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(seconds)
    try:
        return fn()
    finally:
        signal.alarm(0)


def make_stream(kind, n_msgs, rng, p0=2_000_000):
    """(n_msgs, 8) i32 stream of a given cost class."""
    rows = []
    for i in range(n_msgs):
        ts, tn = 34200 + i // 100, (i % 100) * 1000
        if kind == "noop":
            rows.append([0, 0, 0, 0, 0, 0, ts, tn])
        elif kind == "adds":       # non-crossing limit orders
            side = int(rng.integers(0, 2)) * 2 - 1
            off = int(rng.integers(1, 10)) * 100
            price = p0 - off if side == 1 else p0 + 100 + off
            rows.append([1, side, int(rng.integers(1, 50)), price,
                         10_000 + i, 10_000 + i, ts, tn])
        elif kind == "cancels":    # alternate add / cancel-that-order
            if i % 2 == 0:
                side = 1
                rows.append([1, side, 10, p0 - 100, 10_000 + i, 10_000 + i,
                             ts, tn])
            else:
                rows.append([2, 1, 10, p0 - 100, 10_000 + i - 1,
                             10_000 + i - 1, ts, tn])
        elif kind == "match":      # crossing executions against the book
            side = int(rng.integers(0, 2)) * 2 - 1
            if i % 3 == 0:
                rows.append([4, side, int(rng.integers(5, 40)),
                             p0 + (100 if side == -1 else 0), 0, 0, ts, tn])
            else:
                off = int(rng.integers(0, 5)) * 100
                price = p0 - off if side == 1 else p0 + 100 + off
                rows.append([1, side, int(rng.integers(1, 50)), price,
                             10_000 + i, 10_000 + i, ts, tn])
        else:
            raise ValueError(kind)
    return np.array(rows, np.int32)


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    engines = sys.argv[2:] or ["exact"]
    n_msgs = 112

    from reference_oracle import init_book_messages
    from jaxmarl_hft_tpu.config.structs import LobConfig, replace_cfg
    from jaxmarl_hft_tpu.lob import engine, engine_sorted

    print(f"device={jax.devices()[0]} envs={n_envs} msgs={n_msgs}",
          flush=True)

    # build a realistic warm book once (via exact engine)
    rng = np.random.default_rng(0)
    init_msgs = jnp.asarray(init_book_messages(rng), jnp.int32)
    cfg = LobConfig(trade_capture_cap=16)
    state0 = (engine.init_orderside(cfg.nOrders),
              engine.init_orderside(cfg.nOrders),
              engine.init_trades(cfg.nTrades))
    state0, _ = engine.scan_messages_save_bidask(
        cfg, jax.random.PRNGKey(0), init_msgs, state0, init_msgs.shape[0])
    state_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_envs,) + x.shape), state0)
    keys = jax.random.split(jax.random.PRNGKey(1), n_envs)

    for eng in engines:
        ecfg = replace_cfg(cfg, matching_engine=eng)
        scan = engine_sorted.get_engine(ecfg).scan_messages_save_bidask
        for kind in ("noop", "adds", "cancels", "match"):
            msgs = jnp.asarray(np.stack([
                make_stream(kind, n_msgs, np.random.default_rng(100 + e))
                for e in range(min(n_envs, 64))]), jnp.int32)
            msgs = msgs[np.arange(n_envs) % msgs.shape[0]]

            N_ITERS = 16
            vscan = jax.vmap(lambda k, m, s: scan(ecfg, k, m, s, n_msgs))

            # time inside one jit: N_ITERS scans, every output folded into a
            # scalar checksum (defeats DCE), input perturbed per iteration
            # (defeats loop hoisting), only the scalar copied to host.
            @jax.jit
            def run(keys, msgs, state_b):
                def body(acc, i):
                    m = msgs.at[:, 0, 2].add(i % 2)   # vary a quantity
                    out = vscan(keys, m, state_b)
                    leaves = jax.tree.leaves(out)
                    s = sum(jnp.sum(l).astype(jnp.int64) for l in leaves)
                    return acc + s, None
                acc, _ = jax.lax.scan(body, jnp.int64(0),
                                      jnp.arange(N_ITERS, dtype=jnp.int32))
                return acc

            try:
                bounded(f"{eng}/{kind} compile", 900,
                        lambda: np.asarray(run(keys, msgs, state_b)))
                dts = []
                for _ in range(3):
                    t0 = time.time()
                    bounded(f"{eng}/{kind} run", 300,
                            lambda: np.asarray(run(keys, msgs, state_b)))
                    dts.append(time.time() - t0)
                dt = min(dts) / N_ITERS
                print(f"{eng:7s} {kind:8s} {dt*1e3:8.2f} ms "
                      f"({n_envs * n_msgs / dt / 1e6:6.2f} M msgs/s)",
                      flush=True)
            except TimeoutError as e:
                print(f"{eng:7s} {kind:8s} TIMEOUT ({e})", flush=True)
                return


if __name__ == "__main__":
    main()
