"""Trade-capture mode equivalence.

"compressed" extracts per-message records and assembles the buffer once per
scan; "inscan" carries the trade SoA through the scan and writes fills
directly (engine._write_trades_inscan). Both must be bit-identical wherever
their contracts coincide (cap = nTrades for inscan), while the reference
semantics themselves are pinned by the oracle battery
(test_engine_vs_reference.py). A third mode, "postscan" (buffer rebuilt
from per-slot fill planes by an exact one-hot matmul row-gather), was
removed in round 3: bit-identical but 13x slower at production shapes on
v5e — BASELINE.md records the negative result; configs now reject it.

Reference: gymnax_exchange/jaxob/JaxOrderBookArrays.py:172-220 (trade
append + .at[-1] overflow semantics).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jaxmarl_hft_tpu.config.structs import LobConfig
from jaxmarl_hft_tpu.lob import engine

I32 = jnp.int32


def _rand_stream(key, n_msgs, p0=100_000):
    ks = jax.random.split(key, 8)
    types = jax.random.choice(ks[0], jnp.array([0, 1, 1, 1, 2, 2, 4, 4]),
                              (n_msgs,))
    sides = jax.random.choice(ks[1], jnp.array([-1, 1]), (n_msgs,))
    quants = jax.random.randint(ks[2], (n_msgs,), 1, 200)
    prices = p0 + 100 * jax.random.randint(ks[3], (n_msgs,), -10, 11)
    oids = jax.random.randint(ks[4], (n_msgs,), 1, 40)   # forced collisions
    ts = jnp.cumsum(jax.random.randint(ks[5], (n_msgs,), 0, 2))
    tn = jax.random.randint(ks[6], (n_msgs,), 0, 1000)
    return jnp.stack([types, sides, quants, prices, oids, oids, ts, tn],
                     axis=1).astype(I32)


def _run(cfg, key, msgs, n_orders, n_trades):
    book = (engine.init_orderside(n_orders), engine.init_orderside(n_orders),
            engine.init_trades(n_trades))
    return jax.jit(engine.scan_messages, static_argnums=0)(cfg, key, msgs,
                                                           book)


@pytest.mark.parametrize("cancel_mode", [0, 1, 2, 3])
def test_inscan_matches_compressed_fully_exact(cancel_mode):
    """The carried-buffer in-scan write mode at cap = nTrades (where its
    gap-slot semantics provably coincide with the compressed allocation,
    see engine._write_trades_inscan)."""
    n_orders, n_trades = 30, 20
    cfg_c = LobConfig(nOrders=n_orders, nTrades=n_trades,
                      cancel_mode=cancel_mode, trade_capture_cap=0,
                      trade_capture_mode="compressed")
    cfg_i = dataclasses.replace(cfg_c, trade_capture_mode="inscan")
    for seed in range(4):
        key = jax.random.PRNGKey(seed)
        msgs = _rand_stream(jax.random.fold_in(key, 1), 120)
        out_c = _run(cfg_c, key, msgs, n_orders, n_trades)
        out_i = _run(cfg_i, key, msgs, n_orders, n_trades)
        for name, a, b in zip(("asks", "bids", "trades"), out_c, out_i):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"{name} cm={cancel_mode} seed={seed}")


def test_inscan_big_sweep_overflows_buffer():
    """Huge aggressive orders: single messages filling dozens of standing
    orders exercise the rank-prefix extraction and the .at[-1] overflow
    wrap in both modes."""
    n_orders, n_trades = 40, 12
    key = jax.random.PRNGKey(7)
    rows = []
    # build depth: 30 small asks, then giant bids sweeping them repeatedly
    for i in range(30):
        rows.append([1, -1, 3, 100_000 + 100 * (i % 7), 100 + i, 100 + i,
                     1, i])
    for j in range(8):
        rows.append([1, 1, 500, 101_000, 500 + j, 500 + j, 2, j])
        for i in range(10):
            rows.append([1, -1, 2, 100_000 + 100 * (i % 5), 900 + 20 * j + i,
                         900 + 20 * j + i, 3 + j, i])
    msgs = jnp.asarray(rows, dtype=I32)
    cfg_c = LobConfig(nOrders=n_orders, nTrades=n_trades,
                      trade_capture_mode="compressed")
    out_c = _run(cfg_c, key, msgs, n_orders, n_trades)
    out_m = _run(dataclasses.replace(cfg_c, trade_capture_mode="inscan"),
                 key, msgs, n_orders, n_trades)
    for name, a, b in zip(("asks", "bids", "trades"), out_c, out_m):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"inscan {name}")
    # the stream must actually overflow the 12-row buffer for the test to
    # mean anything
    assert int((np.asarray(out_c[2])[:, 0] != -1).sum()) == n_trades


def test_inscan_partial_buffer_start():
    """A partially-filled initial trade buffer (mid-scan resume case): the
    base-slot search must agree between modes."""
    n_orders, n_trades = 30, 20
    cfg_c = LobConfig(nOrders=n_orders, nTrades=n_trades,
                      trade_capture_mode="compressed")
    cfg_i = dataclasses.replace(cfg_c, trade_capture_mode="inscan")
    key = jax.random.PRNGKey(11)
    msgs = _rand_stream(jax.random.fold_in(key, 3), 60)
    pre = np.full((n_trades, 8), -1, np.int32)
    pre[:5] = np.arange(40, dtype=np.int32).reshape(5, 8)  # 5 occupied rows
    book_c = (engine.init_orderside(n_orders), engine.init_orderside(n_orders),
              jnp.asarray(pre))
    out_c = jax.jit(engine.scan_messages, static_argnums=0)(
        cfg_c, key, msgs, book_c)
    out_i = jax.jit(engine.scan_messages, static_argnums=0)(
        cfg_i, key, msgs, book_c)
    for name, a, b in zip(("asks", "bids", "trades"), out_c, out_i):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_unknown_trade_mode_raises():
    cfg = LobConfig(trade_capture_mode="postscan")
    msgs = _rand_stream(jax.random.PRNGKey(0), 4)
    with pytest.raises(ValueError, match="trade_capture_mode"):
        _run(cfg, jax.random.PRNGKey(0), msgs, 10, 10)
