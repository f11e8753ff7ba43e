#!/usr/bin/env python
"""Microbenchmarks isolating engine costs from env machinery."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jaxmarl_hft_tpu.config.structs import LobConfig
from jaxmarl_hft_tpu.lob import engine


def timed(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_msgs = 112
    cfg = LobConfig()
    rng = np.random.default_rng(0)

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from reference_oracle import init_book_messages, random_message_stream

    init = init_book_messages(rng)
    stream = random_message_stream(rng, n_msgs)
    msgs = jnp.asarray(np.tile(stream[None], (n_envs, 1, 1)), jnp.int32)

    state0 = (engine.init_orderside(100), engine.init_orderside(100),
              engine.init_trades(100))
    key = jax.random.PRNGKey(0)
    state0 = engine.scan_messages(cfg, key, jnp.asarray(init), state0)
    batch_state = jax.tree.map(lambda x: jnp.tile(x[None], (n_envs, 1, 1)),
                               state0)
    keys = jax.random.split(key, n_envs)

    # 1) plain scan (final state only)
    f_scan = jax.jit(jax.vmap(lambda k, m, s: engine.scan_messages(
        cfg, k, m, s)))
    t = timed(f_scan, keys, msgs, batch_state)
    print(f"scan_messages:        {t*1e3:8.1f} ms "
          f"({n_envs*n_msgs/t/1e6:6.2f} M msg/s)")

    # 2) scan with best-bid/ask capture (what the env uses)
    f_ba = jax.jit(jax.vmap(lambda k, m, s: engine.scan_messages_save_bidask(
        cfg, k, m, s, n_msgs)))
    t = timed(f_ba, keys, msgs, batch_state)
    print(f"scan_save_bidask:     {t*1e3:8.1f} ms "
          f"({n_envs*n_msgs/t/1e6:6.2f} M msg/s)")

    # 3) noop messages only (scan + select overhead floor)
    noops = jnp.zeros_like(msgs).at[:, :, 6].set(40000)
    t = timed(f_scan, keys, noops, batch_state)
    print(f"scan noops:           {t*1e3:8.1f} ms")

    # 4) limit orders only (matching path)
    lims = msgs.at[:, :, 0].set(1)
    t = timed(f_scan, keys, lims, batch_state)
    print(f"scan all-limits:      {t*1e3:8.1f} ms")

    # 5) cancels only
    cnls = msgs.at[:, :, 0].set(2)
    t = timed(f_scan, keys, cnls, batch_state)
    print(f"scan all-cancels:     {t*1e3:8.1f} ms")

    # 6) single apply_message vmapped (no scan): per-message kernel cost
    f_one = jax.jit(jax.vmap(lambda k, m, s: engine.apply_message(
        cfg, s, k, m)))
    t = timed(f_one, keys, msgs[:, 0], batch_state)
    print(f"single message:       {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
