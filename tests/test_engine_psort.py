"""Parity-sorted engine (engine_psort) vs exact engine: FULL bit-equality.

Unlike engine_sorted (content-equal only), psort must reproduce the exact
engine's slot layout, trade buffer, and best-price stream bit-for-bit at
every cancel mode, type-4 interpretation, and trade cap — including the
slot-order tie-breaks, any-neg1 clobber semantics, .at[-1] quirks, and
trade-buffer overflow wraps (reference: JaxOrderBookArrays.py add_order
:62-83, cancel_order :93-117, match_order :205-217, check_book_fill
:395-408).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jaxmarl_hft_tpu.config.structs import LobConfig
from jaxmarl_hft_tpu.lob import engine, engine_psort

from reference_oracle import init_book_messages, random_message_stream

I32 = jnp.int32


def _fresh(cfg):
    return (engine.init_orderside(cfg.nOrders),
            engine.init_orderside(cfg.nOrders),
            engine.init_trades(cfg.nTrades))


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


def _assert_bitequal(exact, psort, ctx=""):
    for name, a, b in zip(("asks", "bids", "trades"), exact, psort):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"{name} differ bit-for-bit {ctx}")


def _run_both(cfg, msgs, seed=0):
    key = jax.random.PRNGKey(seed)
    e = jax.jit(engine.scan_messages, static_argnums=0)(
        cfg, key, msgs, _fresh(cfg))
    p = jax.jit(engine_psort.scan_messages, static_argnums=0)(
        cfg, key, msgs, _fresh(cfg))
    return e, p


# --------------------------------------------------------------------------- #
# Small-book stress: overflows, evictions, clobbers forced by capacity
# --------------------------------------------------------------------------- #

@pytest.mark.parametrize("cancel_mode", [0, 1, 2, 3])
@pytest.mark.parametrize("cap", [0, 16, 3])
def test_small_book_stress(cancel_mode, cap):
    cfg = LobConfig(nOrders=30, nTrades=20, cancel_mode=cancel_mode,
                    trade_capture_cap=cap)
    for seed in range(3):
        msgs = _rand_stream(jax.random.PRNGKey(seed + 100), 120)
        e, p = _run_both(cfg, msgs, seed)
        _assert_bitequal(e, p, f"(cm={cancel_mode} cap={cap} seed={seed})")


@pytest.mark.parametrize("t4", [0, 1, 2])
def test_type4_interpretations(t4):
    cfg = LobConfig(nOrders=30, nTrades=20, type_4_interpretation=t4)
    msgs = _rand_stream(jax.random.PRNGKey(7), 150)
    e, p = _run_both(cfg, msgs)
    _assert_bitequal(e, p, f"(type4={t4})")


def test_no_check_book_fill():
    cfg = LobConfig(nOrders=10, nTrades=20, check_book_fill=False)
    msgs = _rand_stream(jax.random.PRNGKey(3), 150)
    e, p = _run_both(cfg, msgs)
    _assert_bitequal(e, p, "(check_book_fill=False)")


def test_tiny_book_forced_eviction():
    """nOrders=5 forces repeated full-book evictions and .at[-1] clobbers."""
    cfg = LobConfig(nOrders=5, nTrades=8)
    for seed in range(4):
        msgs = _rand_stream(jax.random.PRNGKey(seed), 200)
        e, p = _run_both(cfg, msgs, seed)
        _assert_bitequal(e, p, f"(tiny book seed={seed})")


# --------------------------------------------------------------------------- #
# Oracle-style realistic streams
# --------------------------------------------------------------------------- #

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_oracle_stream(seed):
    cfg = LobConfig()
    rng = np.random.default_rng(seed)
    msgs = jnp.asarray(np.concatenate([init_book_messages(rng),
                                       random_message_stream(rng, 300)]),
                       I32)
    e, p = _run_both(cfg, msgs, seed)
    _assert_bitequal(e, p, f"(oracle stream seed={seed})")


def test_bidask_stream_bitequal():
    cfg = LobConfig(nOrders=30, nTrades=20)
    msgs = _rand_stream(jax.random.PRNGKey(11), 120)
    key = jax.random.PRNGKey(0)
    last_e, (ask_e, bid_e) = jax.jit(
        engine.scan_messages_save_bidask, static_argnums=(0, 4))(
        cfg, key, msgs, _fresh(cfg), 64)
    last_p, (ask_p, bid_p) = jax.jit(
        engine_psort.scan_messages_save_bidask, static_argnums=(0, 4))(
        cfg, key, msgs, _fresh(cfg), 64)
    _assert_bitequal(last_e, last_p, "(bidask last state)")
    np.testing.assert_array_equal(np.asarray(ask_e), np.asarray(ask_p))
    np.testing.assert_array_equal(np.asarray(bid_e), np.asarray(bid_p))


def test_save_states_bitequal():
    cfg = LobConfig(nOrders=20, nTrades=20)
    msgs = _rand_stream(jax.random.PRNGKey(13), 60)
    key = jax.random.PRNGKey(0)
    a_e, b_e, t_e = jax.jit(
        engine.scan_messages_save_states, static_argnums=(0, 4))(
        cfg, key, msgs, _fresh(cfg), 16)
    a_p, b_p, t_p = jax.jit(
        engine_psort.scan_messages_save_states, static_argnums=(0, 4))(
        cfg, key, msgs, _fresh(cfg), 16)
    np.testing.assert_array_equal(np.asarray(a_e), np.asarray(a_p))
    np.testing.assert_array_equal(np.asarray(b_e), np.asarray(b_p))
    np.testing.assert_array_equal(np.asarray(t_e), np.asarray(t_p))


# --------------------------------------------------------------------------- #
# Targeted quirk cases
# --------------------------------------------------------------------------- #

def _msg(t, s, q, p, oid, tid, ts, tn):
    return [t, s, q, p, oid, tid, ts, tn]


def test_zero_quant_add_clobbers_anyneg1_row():
    """A tid=-1 limit order is clobberable (any-neg1 rule); a later
    zero-quant add must remove it without inserting anything — on both
    engines identically."""
    cfg = LobConfig(nOrders=8, nTrades=8)
    msgs = jnp.asarray([
        _msg(1, -1, 5, 100_000, 10, -1, 1, 0),    # ask with tid=-1 (any-neg1)
        _msg(1, -1, 5, 100_100, 11, 7, 2, 0),     # normal ask
        _msg(1, -1, 0, 100_200, 12, 8, 3, 0),     # zero-quant add: clobbers
        _msg(1, 1, 3, 100_100, 13, 9, 4, 0),      # bid crosses the ask
    ], I32)
    e, p = _run_both(cfg, msgs)
    _assert_bitequal(e, p, "(zero-quant clobber)")


def test_cancel_oid_minus_one_probes_empty_slot():
    """A cancel with oid=-1 matches the first empty slot in the reference
    (its sentinel oid is -1) and must not fall through to the init/random
    fallbacks."""
    cfg = LobConfig(nOrders=8, nTrades=8, cancel_mode=3)
    msgs = jnp.asarray([
        _msg(1, -1, 5, 100_000, 10, 7, 1, 0),
        _msg(2, -1, 5, 100_000, -1, 7, 2, 0),     # oid=-1 cancel
        _msg(1, -1, 4, 100_000, 11, 7, 3, 0),
    ], I32)
    e, p = _run_both(cfg, msgs)
    _assert_bitequal(e, p, "(oid=-1 cancel)")


def test_unmatched_cancel_hits_last_slot_occupied():
    """An unmatched cancel lands on slot n-1 (.at[-1] quirk); make slot n-1
    occupied so the write is visible."""
    cfg = LobConfig(nOrders=4, nTrades=8, cancel_mode=0)
    msgs = jnp.asarray([
        _msg(1, -1, 5, 100_000, 10, 7, 1, 0),
        _msg(1, -1, 5, 100_100, 11, 7, 2, 0),
        _msg(1, -1, 5, 100_200, 12, 7, 3, 0),
        _msg(1, -1, 5, 100_300, 13, 7, 4, 0),     # fills slot 3 = n-1
        _msg(2, -1, 2, 999_999, 99, 7, 5, 0),     # unmatched cancel
    ], I32)
    e, p = _run_both(cfg, msgs)
    _assert_bitequal(e, p, "(.at[-1] occupied)")


def test_trade_buffer_overflow_last_wins():
    """More fills than trade slots: the last slot must hold the globally
    last fill (reference .at[-1] wrap), with allocated-gap semantics at a
    small cap."""
    for cap in (0, 2):
        cfg = LobConfig(nOrders=16, nTrades=4, trade_capture_cap=cap)
        msgs = jnp.asarray(
            [_msg(1, -1, 1, 100_000 + 100 * i, 10 + i, 7, 1, i)
             for i in range(8)]
            + [_msg(1, 1, 8, 101_000, 50, 9, 2, 0)],   # sweeps all 8 asks
            I32)
        e, p = _run_both(cfg, msgs)
        _assert_bitequal(e, p, f"(overflow cap={cap})")


def test_equal_key_tiebreak_follows_slot_order():
    """Orders with identical (price, ts, tn) must match in reference slot
    order — exercised by cancelling to create a low slot hole, re-adding,
    then sweeping."""
    cfg = LobConfig(nOrders=8, nTrades=16)
    msgs = jnp.asarray([
        _msg(1, -1, 1, 100_000, 10, 7, 5, 5),
        _msg(1, -1, 1, 100_000, 11, 7, 5, 5),     # same key, slot 1
        _msg(1, -1, 1, 100_000, 12, 7, 5, 5),     # same key, slot 2
        _msg(2, -1, 1, 100_000, 11, 7, 6, 0),     # free slot 1
        _msg(1, -1, 1, 100_000, 13, 7, 5, 5),     # same key, lands in slot 1
        _msg(1, 1, 2, 100_000, 60, 9, 7, 0),      # partial sweep: 2 of 3
    ], I32)
    e, p = _run_both(cfg, msgs)
    _assert_bitequal(e, p, "(equal-key tiebreak)")


def test_partial_trade_buffer_start():
    """A scan starting from a partially-filled trade buffer continues from
    the first empty slot."""
    cfg = LobConfig(nOrders=16, nTrades=6)
    key = jax.random.PRNGKey(0)
    msgs1 = _rand_stream(jax.random.PRNGKey(21), 40)
    book_e = jax.jit(engine.scan_messages, static_argnums=0)(
        cfg, key, msgs1, _fresh(cfg))
    msgs2 = _rand_stream(jax.random.PRNGKey(22), 40)
    key2 = jax.random.PRNGKey(1)
    e = jax.jit(engine.scan_messages, static_argnums=0)(
        cfg, key2, msgs2, book_e)
    p = jax.jit(engine_psort.scan_messages, static_argnums=0)(
        cfg, key2, msgs2, book_e)
    _assert_bitequal(e, p, "(partial buffer start)")


def test_apply_message_single():
    cfg = LobConfig(nOrders=8, nTrades=8)
    key = jax.random.PRNGKey(0)
    book = _fresh(cfg)
    for m in np.asarray(_rand_stream(jax.random.PRNGKey(30), 20)):
        m = jnp.asarray(m, I32)
        e = engine.apply_message(cfg, book, key, m)
        p = engine_psort.apply_message(cfg, book, key, m)
        _assert_bitequal(e, p, "(apply_message)")
        book = e


# --------------------------------------------------------------------------- #
# Mega-kill stress (kept from the round-3 deferred-compaction experiment,
# which was reverted — BASELINE.md records the negative result): repeated
# full-side drains are the adversarial case for any compaction scheme.
# --------------------------------------------------------------------------- #

def test_megakill_refill_cycles_bitequal():
    """Repeatedly fill a side to capacity and drain it with one huge order
    (the whole side dies in one message), then refill."""
    cfg = LobConfig(nOrders=20, nTrades=100)
    rows = []
    t = 0
    for cycle in range(6):
        for i in range(20):                      # fill ask side to capacity
            rows.append([1, -1, 3, 100_000 + 100 * (i % 5), 1000 + t,
                         1000 + t, 34200 + t, t])
            t += 1
        # one bid sweeps the whole side (20 kills in one message)
        rows.append([1, 1, 500, 101_000, 2000 + t, 2000 + t, 34200 + t, t])
        t += 1
    msgs = jnp.asarray(np.array(rows, dtype=np.int32))
    e, p = _run_both(cfg, msgs)
    _assert_bitequal(e, p, "(megakill/refill cycles)")


def test_domain_violation_guard():
    """Out-of-domain messages (negative quant / price == -1 on an active
    type) are the one corner where psort deliberately diverges from the
    reference's empty-slot corruption; the guard helpers must flag exactly
    those."""
    good = jnp.asarray([[1, 1, 5, 1000, 7, 7, 1, 0],
                        [2, -1, 3, 900, 8, 8, 1, 1],
                        [0, 0, -5, -1, 0, 0, 0, 0]], I32)   # type 0: inert
    assert not np.asarray(engine_psort.domain_violations(good)).any()
    engine_psort.assert_in_domain(good)

    bad = jnp.asarray([[2, 1, -4, 1000, 7, 7, 1, 0],        # negative quant
                       [1, 1, 5, -1, 9, 9, 1, 0]], I32)     # price == -1 add
    assert np.asarray(engine_psort.domain_violations(bad)).all()
    with pytest.raises(ValueError, match="domain violation"):
        engine_psort.assert_in_domain(bad)


def test_wide_book_int32_carry_fallback():
    """nOrders > 126 exceeds int8 range for the carried index planes
    (round-5 narrowing): _idx_dtype must fall back to int32 and stay
    bit-parity with the exact engine on a busy stream."""
    from jaxmarl_hft_tpu.lob.engine_psort import _idx_dtype
    import jax.numpy as jnp
    assert _idx_dtype(100) == jnp.int8
    assert _idx_dtype(127) == jnp.int32
    cfg = LobConfig(nOrders=150, nTrades=40)
    for seed in (0, 1):
        msgs = _rand_stream(jax.random.PRNGKey(seed + 900), 150)
        e, p = _run_both(cfg, msgs, seed)
        _assert_bitequal(e, p, f"(wide book seed={seed})")
