"""Runtime exactness certificate for capped trade capture.

The capped trade-capture modes (compressed / inscan with trade_capture_cap <
nTrades) are bit-identical to fully-exact capture unless a single message
fills more than ``cap`` standing orders (engine._finalize_trades contract,
BASELINE.md "trade-capture cap"; reference append semantics:
gymnax_exchange/jaxob/JaxOrderBookArrays.py:205-217). The certificate
(engine._overflow_flag, surfaced per scan by scan_messages_save_bidask_cert
and per env step as info["world"]["trade_overflow"]) turns that static
contract into a runtime guarantee: flag False => the capped output IS the
fully-exact output, so production can run the ~190k capped operating point
*certified* exact instead of paying for exactness the workload never
exercises.

Ground truth here is the fill count per message recovered from a
cap-independent fully-exact trade buffer (psort backend, oversized buffer so
nothing wraps): one trade row per filled standing order, grouped by the
aggressor message's unique (time_s, time_ns).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jaxmarl_hft_tpu.config.structs import LobConfig
from jaxmarl_hft_tpu.lob import engine, engine_psort, engine_sorted

I32 = jnp.int32

N_ORDERS, N_TRADES = 40, 200  # oversized buffer: no .at[-1] wrap confound


def _stream(key, n_msgs, p0=100_000):
    """Random adversarial stream with a UNIQUE (ts, tn) per message so trade
    rows can be attributed to their aggressor message."""
    ks = jax.random.split(key, 8)
    types = jax.random.choice(ks[0], jnp.array([0, 1, 1, 1, 2, 2, 4, 4]),
                              (n_msgs,))
    sides = jax.random.choice(ks[1], jnp.array([-1, 1]), (n_msgs,))
    quants = jax.random.randint(ks[2], (n_msgs,), 1, 200)
    prices = p0 + 100 * jax.random.randint(ks[3], (n_msgs,), -10, 11)
    oids = jax.random.randint(ks[4], (n_msgs,), 1, 40)
    ts = jnp.cumsum(jax.random.randint(ks[5], (n_msgs,), 0, 2))
    tn = jnp.arange(n_msgs, dtype=I32)          # unique within a second
    return jnp.stack([types, sides, quants, prices, oids, oids, ts, tn],
                     axis=1).astype(I32)


def _sweep_stream():
    """Deterministic stream with single messages filling many orders."""
    rows = []
    for i in range(30):
        rows.append([1, -1, 3, 100_000 + 100 * (i % 7), 100 + i, 100 + i,
                     1, i])
    for j in range(6):
        rows.append([1, 1, 500, 101_000, 500 + j, 500 + j, 2, 100 + j])
        for i in range(10):
            rows.append([1, -1, 2, 100_000 + 100 * (i % 5),
                         900 + 20 * j + i, 900 + 20 * j + i, 3 + j,
                         200 + 10 * j + i])
    return jnp.asarray(rows, dtype=I32)


def _book():
    return (engine.init_orderside(N_ORDERS), engine.init_orderside(N_ORDERS),
            engine.init_trades(N_TRADES))


def _exact_fill_counts(key, msgs):
    """Per-message fill counts from psort's cap-independent exact buffer."""
    a, b, trades = jax.jit(engine_psort.scan_messages, static_argnums=0)(
        LobConfig(nOrders=N_ORDERS, nTrades=N_TRADES,
                  matching_engine="psort"), key, msgs, _book())
    tr = np.asarray(trades)
    tr = tr[tr[:, 0] != -1]
    m = np.asarray(msgs)
    counts = np.zeros(m.shape[0], dtype=np.int64)
    for i in range(m.shape[0]):
        counts[i] = int(((tr[:, 4] == m[i, 6]) & (tr[:, 5] == m[i, 7])).sum())
    assert counts.sum() == tr.shape[0], "every trade row attributed"
    return counts


def _cert_scan(cfg, key, msgs):
    fn = jax.jit(engine_sorted.get_cert_scan_fn(cfg), static_argnums=(0, 4))
    (a, b, t), _, ovf = fn(cfg, key, msgs, _book(), 1)
    return np.asarray(t), bool(np.asarray(ovf))


@pytest.mark.parametrize("mode", ["compressed", "inscan"])
@pytest.mark.parametrize("cap", [1, 2, 4, 16, 0])
def test_certificate_fires_iff_fill_count_exceeds_cap(mode, cap):
    """Flag semantics: fires iff some message fills > cap standing orders
    (ground truth from psort's exact buffer), in both capped modes."""
    streams = [_sweep_stream()] + [
        _stream(jax.random.fold_in(jax.random.PRNGKey(5), s), 120)
        for s in range(3)]
    fired_somewhere = False
    for si, msgs in enumerate(streams):
        key = jax.random.PRNGKey(si)
        counts = _exact_fill_counts(key, msgs)
        eff_cap = cap if cap else N_TRADES
        expected = bool((counts > eff_cap).any())
        cfg = LobConfig(nOrders=N_ORDERS, nTrades=N_TRADES,
                        matching_engine="exact",
                        trade_capture_cap=cap, trade_capture_mode=mode)
        _, ovf = _cert_scan(cfg, key, msgs)
        assert ovf == expected, (mode, cap, si, counts.max())
        fired_somewhere |= expected
    if cap in (1, 2, 4):
        # the battery must actually exercise the firing path at small caps
        assert fired_somewhere, (mode, cap)


@pytest.mark.parametrize("mode", ["compressed", "inscan"])
@pytest.mark.parametrize("cap", [2, 4, 16])
def test_clean_certificate_implies_bit_exact_trades(mode, cap):
    """Whenever the flag is False, the capped buffer must be bit-identical
    to the fully-exact one; the sweep stream shows the converse (flag True
    and buffers differing) is real, not vacuous."""
    exact_cfg = LobConfig(nOrders=N_ORDERS, nTrades=N_TRADES,
                          matching_engine="exact", trade_capture_cap=0,
                          trade_capture_mode="compressed")
    # a no-cross stream (bids strictly below asks, zero fills) is clean at
    # every cap; the sweep + random streams exercise the firing path
    no_cross = jnp.asarray(
        [[1, -1, 5, 101_000 + 100 * i, 300 + i, 300 + i, 1, i]
         for i in range(10)]
        + [[1, 1, 5, 99_000 - 100 * i, 400 + i, 400 + i, 2, i]
           for i in range(10)], dtype=I32)
    seen_clean = seen_fired_diff = False
    streams = [no_cross, _sweep_stream()] + [
        _stream(jax.random.fold_in(jax.random.PRNGKey(9), s), 120)
        for s in range(4)]
    for si, msgs in enumerate(streams):
        key = jax.random.PRNGKey(100 + si)
        t_exact, ovf0 = _cert_scan(exact_cfg, key, msgs)
        assert not ovf0  # fully exact can't overflow (cap = nTrades>=fills)
        cfg = LobConfig(nOrders=N_ORDERS, nTrades=N_TRADES,
                        matching_engine="exact",
                        trade_capture_cap=cap, trade_capture_mode=mode)
        t_cap, ovf = _cert_scan(cfg, key, msgs)
        if not ovf:
            np.testing.assert_array_equal(t_cap, t_exact,
                                          err_msg=f"{mode} cap={cap} s={si}")
            seen_clean = True
        elif not np.array_equal(t_cap, t_exact):
            seen_fired_diff = True
    assert seen_clean
    if cap <= 4:
        assert seen_fired_diff, (mode, cap)


@pytest.mark.parametrize("backend", ["psort", "sorted"])
@pytest.mark.parametrize("cap", [2, 16, 0])
def test_backend_certificates_match_exact_engine(backend, cap):
    """psort/sorted honor trade_capture_cap in their trade writes exactly
    like the exact engine (bit-parity / content-parity at every cap), so
    their certificates must fire on the same scans as the exact engine's —
    including firing at small caps on the sweep stream. (An earlier
    round-4 revision wrongly hard-coded these backends' flags to False —
    a code-review finding; this test replaces the one that enshrined it.)
    The cert scan's state outputs must equal the plain bidask scan's."""
    msgs_set = [_sweep_stream()] + [
        _stream(jax.random.fold_in(jax.random.PRNGKey(21), s), 120)
        for s in range(2)]
    fired = False
    for si, msgs in enumerate(msgs_set):
        key = jax.random.PRNGKey(3 + si)
        cfg = LobConfig(nOrders=N_ORDERS, nTrades=N_TRADES,
                        matching_engine=backend, trade_capture_cap=cap)
        mod = engine_sorted.get_engine(cfg)
        last, hist, ovf = jax.jit(mod.scan_messages_save_bidask_cert,
                                  static_argnums=(0, 4))(cfg, key, msgs,
                                                         _book(), 4)
        exact_cfg = LobConfig(nOrders=N_ORDERS, nTrades=N_TRADES,
                              matching_engine="exact", trade_capture_cap=cap,
                              trade_capture_mode="compressed")
        _, ovf_exact = _cert_scan(exact_cfg, key, msgs)
        assert bool(np.asarray(ovf)) == ovf_exact, (backend, cap, si)
        fired |= bool(np.asarray(ovf))
        last2, hist2 = jax.jit(mod.scan_messages_save_bidask,
                               static_argnums=(0, 4))(cfg, key, msgs,
                                                      _book(), 4)
        for a, b in zip(last, last2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(hist, hist2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    if cap == 2:
        assert fired, backend   # the battery must exercise the firing path
    if cap == 0:
        assert not fired, backend   # fully exact cannot overflow


def test_env_step_surfaces_certificate():
    """info["world"]["trade_overflow"] exists, is a bool scalar, and is
    constant False under the psort default; under the capped exact engine it
    matches the engine-level flag computed on the same step's message
    stream (indirect: a cap of nTrades can't fire)."""
    from jaxmarl_hft_tpu.config.structs import (ExecConfig, MMConfig,
                                                MultiAgentConfig, WorldConfig)
    from jaxmarl_hft_tpu.envs.marl import MarlEnv

    def env_for(engine_name, cap):
        world = WorldConfig(
            synthetic_data=True, synthetic_n_msgs=4000,
            ep_type="fixed_steps", episode_time=8, start_resolution=8,
            n_data_msg_per_step=20, use_pickles_for_init=False,
            matching_engine=engine_name, trade_capture_cap=cap,
            trade_capture_mode="auto")
        agents = (
            ("MarketMaking", MMConfig(action_space="fixed_quants",
                                      observation_space="basic",
                                      fixed_quant_value=1,
                                      auto_liquidate_threshold=0,
                                      unwind_price_penalty=0)),
            ("Execution", ExecConfig(action_space="fixed_quants_complex",
                                     observation_space="engineered",
                                     task_size=60)),
        )
        return MarlEnv(jax.random.PRNGKey(0), MultiAgentConfig(
            world_config=world, agents=agents,
            number_of_agents_per_type=(1, 1)))

    for engine_name, cap, expect_false in (("psort", 0, True),
                                           ("exact", 0, True),
                                           ("exact", 1, False)):
        env = envp = env_for(engine_name, cap)
        params = envp.default_params
        key = jax.random.PRNGKey(1)
        _, state = env.reset_env(key, params)
        fired = False
        for step in range(6):
            k = jax.random.fold_in(jax.random.PRNGKey(2), step)
            acts = [jnp.asarray(step % 10, I32), jnp.asarray(step % 13, I32)]
            _, state, _, _, info = env.step_env(k, state, acts, params)
            ovf = info["world"]["trade_overflow"]
            assert np.asarray(ovf).dtype == np.bool_
            assert np.asarray(ovf).shape == ()
            fired |= bool(np.asarray(ovf))
        if expect_false:
            assert not fired, (engine_name, cap)
