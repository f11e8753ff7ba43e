"""A/B the engine message-scan lax.scan unroll factor on the chip.

Unrolling is semantics-preserving; the question is purely whether XLA keeps
the (batch, nOrders) carry planes fused across unrolled iterations (fewer
HBM round-trips) or just bloats the program.

Usage: timeout 3600 python scripts/probe_unroll.py [n_envs] [unrolls..]
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


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    unrolls = [int(x) for x in sys.argv[2:]] or [1, 2, 4, 8]
    n_msgs = 112

    from reference_oracle import init_book_messages
    from probe_engine_floor import make_stream
    from jaxmarl_hft_tpu.config.structs import LobConfig, replace_cfg
    from jaxmarl_hft_tpu.lob import engine

    print(f"device={jax.devices()[0]} envs={n_envs} msgs={n_msgs}",
          flush=True)

    rng = np.random.default_rng(0)
    init_msgs = jnp.asarray(init_book_messages(rng), jnp.int32)
    cfg0 = LobConfig(trade_capture_cap=16)
    state0 = (engine.init_orderside(cfg0.nOrders),
              engine.init_orderside(cfg0.nOrders),
              engine.init_trades(cfg0.nTrades))
    state0, _ = engine.scan_messages_save_bidask(
        cfg0, jax.random.PRNGKey(0), init_msgs, state0, init_msgs.shape[0])
    state_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_envs,) + x.shape), state0)
    keys = jax.random.split(jax.random.PRNGKey(1), n_envs)

    msgs = jnp.asarray(np.stack([
        make_stream("match", n_msgs, np.random.default_rng(100 + e))
        for e in range(min(n_envs, 64))]), jnp.int32)
    msgs = msgs[np.arange(n_envs) % msgs.shape[0]]

    ref_sum = None
    for u in unrolls:
        ecfg = replace_cfg(cfg0, scan_unroll=u)
        N_ITERS = 16
        vscan = jax.vmap(
            lambda k, m, s: engine.scan_messages_save_bidask(
                ecfg, k, m, s, n_msgs))

        @jax.jit
        def run(keys, msgs, state_b):
            def body(acc, i):
                m = msgs.at[:, 0, 2].add(i % 2)
                out = vscan(keys, m, state_b)
                leaves = jax.tree.leaves(out)
                s = sum(jnp.sum(l).astype(jnp.int64) for l in leaves)
                return acc + s, None
            acc, _ = jax.lax.scan(body, jnp.int64(0),
                                  jnp.arange(N_ITERS, dtype=jnp.int32))
            return acc

        try:
            t0 = time.time()
            chk = bounded(f"u{u} compile", 900,
                          lambda: np.asarray(run(keys, msgs, state_b)))
            ct = time.time() - t0
            if ref_sum is None:
                ref_sum = int(chk)
            ok = "OK " if int(chk) == ref_sum else "MISMATCH"
            dts = []
            for _ in range(3):
                t0 = time.time()
                bounded(f"u{u} run", 300,
                        lambda: np.asarray(run(keys, msgs, state_b)))
                dts.append(time.time() - t0)
            dt = min(dts) / N_ITERS
            print(f"unroll={u:2d} {dt*1e3:8.2f} ms "
                  f"({n_envs * n_msgs / dt / 1e6:6.2f} M msgs/s) "
                  f"checksum {ok} compile {ct:.0f}s", flush=True)
        except TimeoutError as e:
            print(f"unroll={u}: TIMEOUT ({e})", flush=True)


if __name__ == "__main__":
    main()
