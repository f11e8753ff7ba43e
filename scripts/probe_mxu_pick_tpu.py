#!/usr/bin/env python
"""On-chip engine bit-equality probe: TPU vs CPU backends.

Runs the full message scan (trade_capture_cap = exact and 16) on the real
TPU over random adversarial streams (deep multi-fill matches, large
quantities) and compares bit-for-bit against the CPU backend.

History: written to validate an MXU-matmul formulation of the engine's
one-hot pick contractions (int32 split into bf16-exact 8-bit chunks,
selected by a (rows, n) @ (n, 4F) matmul). That formulation WAS bit-exact
on hardware (this probe passed) but 4-5x SLOWER — tiny batched matmuls
per scanned message lower to padded MXU tiles; even the once-per-scan
picks lost ~23%. Reverted; kept as a general engine-on-chip exactness
check (the VPU one-hot path is the production default this now guards)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jaxmarl_hft_tpu.config.structs import LobConfig, replace_cfg
from jaxmarl_hft_tpu.lob import engine


def make_stream(key, n_msgs=150, base_price=2_000_000):
    """Random messages incl. large quantities (deep multi-fill matches)."""
    ks = jax.random.split(key, 8)
    types = jax.random.choice(ks[0], jnp.array([1, 1, 1, 2, 4]), (n_msgs,))
    sides = jax.random.choice(ks[1], jnp.array([-1, 1]), (n_msgs,))
    prices = base_price + 100 * jax.random.randint(ks[2], (n_msgs,), -20, 20)
    quants = jax.random.randint(ks[3], (n_msgs,), 1, 500)
    oids = jax.random.randint(ks[4], (n_msgs,), 1, 10_000)
    tids = oids
    ts = jnp.sort(jax.random.randint(ks[5], (n_msgs,), 34200, 36000))
    tns = jax.random.randint(ks[6], (n_msgs,), 0, 1_000_000_000)
    return jnp.stack([types, sides, quants, prices, oids, tids, ts, tns],
                     axis=1).astype(jnp.int32)


def run(cfg, msgs, device):
    book = (engine.init_orderside(cfg.nOrders),
            engine.init_orderside(cfg.nOrders),
            engine.init_trades(cfg.nTrades))
    key = jax.random.PRNGKey(7)
    with jax.default_device(device):
        out = jax.jit(engine.scan_messages, static_argnums=0)(cfg, key,
                                                              msgs, book)
        return jax.tree.map(np.asarray, out)


def main():
    devs = {d.platform: d for d in jax.devices() + jax.devices("cpu")}
    cpu = devs["cpu"]
    tpu = devs.get("tpu") or devs.get("axon")
    if tpu is None:
        other = [d for d in jax.devices() if d.platform != "cpu"]
        tpu = other[0] if other else None
    if tpu is None:
        raise SystemExit("no TPU visible")
    print(f"comparing {tpu} vs {cpu}")

    for cap in (0, 16):
        cfg = LobConfig(trade_capture_cap=cap)
        for seed in range(5):
            msgs = make_stream(jax.random.PRNGKey(seed))
            a = run(cfg, msgs, tpu)
            b = run(cfg, msgs, cpu)
            for name, x, y in zip(("asks", "bids", "trades"), a, b):
                if not np.array_equal(x, y):
                    bad = np.argwhere(x != y)
                    raise SystemExit(
                        f"MISMATCH cap={cap} seed={seed} {name}: "
                        f"{bad[:5]} tpu={x[tuple(bad[0])]} "
                        f"cpu={y[tuple(bad[0])]}")
            n_trades = int((a[2][:, 0] != -1).sum())
            print(f"cap={cap} seed={seed}: bit-identical "
                  f"({n_trades} trade rows)")
    print("OK: MXU-pick path exact on TPU")


if __name__ == "__main__":
    main()
