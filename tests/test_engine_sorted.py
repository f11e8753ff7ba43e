"""Sorted-book fast engine vs exact (slot-layout) engine.

Fills, trade rows, best-price streams and book *contents* must agree; only
row placement may differ (the sorted engine keeps sides priority-ordered).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jaxmarl_hft_tpu.config.structs import LobConfig
from jaxmarl_hft_tpu.lob import engine, engine_sorted

from reference_oracle import init_book_messages, random_message_stream

CFG = LobConfig()


def _fresh(cfg=CFG):
    return (engine.init_orderside(cfg.nOrders),
            engine.init_orderside(cfg.nOrders),
            engine.init_trades(cfg.nTrades))


def _canon(side):
    """Canonical (sorted-rows) view of a book side for content comparison."""
    a = np.asarray(side)
    order = np.lexsort(a.T[::-1])
    return a[order]


def _run_both(cfg, msgs, key_seed=0):
    key = jax.random.PRNGKey(key_seed)
    msgs = jnp.asarray(msgs, dtype=jnp.int32)
    exact = engine.scan_messages(cfg, key, msgs, _fresh(cfg))
    fast = engine_sorted.scan_messages(cfg, key, msgs, _fresh(cfg))
    return exact, fast


def _assert_equiv(exact, fast):
    np.testing.assert_array_equal(_canon(exact[0]), _canon(fast[0]),
                                  err_msg="ask contents differ")
    np.testing.assert_array_equal(_canon(exact[1]), _canon(fast[1]),
                                  err_msg="bid contents differ")
    np.testing.assert_array_equal(np.asarray(exact[2]), np.asarray(fast[2]),
                                  err_msg="trades differ")


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_random_stream(seed):
    rng = np.random.default_rng(seed)
    msgs = np.concatenate([init_book_messages(rng),
                           random_message_stream(rng, 300)])
    exact, fast = _run_both(CFG, msgs)
    _assert_equiv(exact, fast)


def test_sorted_invariant():
    """After a scan, each valid side prefix is sorted by priority and empty
    rows are a -1 tail."""
    rng = np.random.default_rng(5)
    msgs = np.concatenate([init_book_messages(rng),
                           random_message_stream(rng, 200)])
    key = jax.random.PRNGKey(0)
    fast = engine_sorted.scan_messages(CFG, key,
                                       jnp.asarray(msgs, jnp.int32), _fresh())
    for side, is_ask in ((fast[0], True), (fast[1], False)):
        a = np.asarray(side)
        valid = a[:, 0] != -1
        nv = valid.sum()
        assert valid[:nv].all() and not valid[nv:].any(), "not compacted"
        p = a[:nv, 0]
        if is_ask:
            assert (np.diff(p) >= 0).all()
        else:
            assert (np.diff(p) <= 0).all()
        # time-priority within equal prices
        for price in np.unique(p):
            rows = a[:nv][p == price]
            t = rows[:, 4] * 1_000_000_000 + rows[:, 5]
            assert (np.diff(t) >= 0).all()
        # empty tail is all -1
        assert (a[nv:] == -1).all()


def test_bidask_stream_equivalence():
    rng = np.random.default_rng(6)
    msgs = jnp.asarray(np.concatenate([init_book_messages(rng),
                                       random_message_stream(rng, 150)]),
                       jnp.int32)
    key = jax.random.PRNGKey(0)
    ex_state, (ex_a, ex_b) = engine.scan_messages_save_bidask(
        CFG, key, msgs, _fresh(), 64)
    fa_state, (fa_a, fa_b) = engine_sorted.scan_messages_save_bidask(
        CFG, key, msgs, _fresh(), 64)
    np.testing.assert_array_equal(np.asarray(ex_a), np.asarray(fa_a))
    np.testing.assert_array_equal(np.asarray(ex_b), np.asarray(fa_b))
    _assert_equiv(ex_state, fa_state)


def test_aggressive_drain_and_overflow():
    cfg = LobConfig(nOrders=50, nTrades=8)
    rows = [[1, -1, 1, 2_200_000, 200 + i, 200 + i, 34200, i]
            for i in range(20)]
    rows.append([1, 1, 50, 2_300_000, 300, 300, 34201, 0])
    exact, fast = _run_both(cfg, np.array(rows, np.int32))
    _assert_equiv(exact, fast)


def test_full_book_eviction():
    cfg = LobConfig(nOrders=12, nTrades=12)
    rows = [[1, 1, 10, 2_000_000 + 100 * (i % 13), 100 + i, 100 + i,
             34200, i] for i in range(14)]
    exact, fast = _run_both(cfg, np.array(rows, np.int32))
    _assert_equiv(exact, fast)


def test_env_equivalence_sorted_vs_exact():
    """Whole-env equivalence: a rollout with the sorted engine produces the
    same rewards and best-price paths as with the exact engine."""
    from jaxmarl_hft_tpu.config.structs import replace_cfg
    from jaxmarl_hft_tpu.envs.marl import MarlEnv
    from test_marl_env import make_test_config, random_actions

    cfg_s = make_test_config()
    cfg_e_world = replace_cfg(cfg_s.world_config, matching_engine="exact")
    from jaxmarl_hft_tpu.config.structs import MultiAgentConfig
    cfg_e = MultiAgentConfig(world_config=cfg_e_world, agents=cfg_s.agents,
                             number_of_agents_per_type=
                             cfg_s.number_of_agents_per_type)

    env_s = MarlEnv(jax.random.PRNGKey(0), cfg_s)
    env_e = MarlEnv(jax.random.PRNGKey(0), cfg_e)
    ps, pe = env_s.default_params, env_e.default_params

    key = jax.random.PRNGKey(3)
    obs_s, st_s = env_s.reset_env(key, ps)
    obs_e, st_e = env_e.reset_env(key, pe)
    np.testing.assert_allclose(np.asarray(obs_s[0]), np.asarray(obs_e[0]))
    k = key
    for _ in range(6):
        k, ak, sk = jax.random.split(k, 3)
        acts = random_actions(env_s, ak)
        obs_s, st_s, r_s, d_s, i_s = env_s.step_env(sk, st_s, acts, ps)
        obs_e, st_e, r_e, d_e, i_e = env_e.step_env(sk, st_e, acts, pe)
        for a, b in zip(r_s, r_e):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(st_s.world_state.best_asks),
            np.asarray(st_e.world_state.best_asks))
        np.testing.assert_array_equal(
            np.asarray(st_s.world_state.trades),
            np.asarray(st_e.world_state.trades))


@pytest.mark.parametrize("cap", [2, 16])
def test_capped_trade_capture_matches_exact(cap):
    """trade_capture_cap must apply to the sorted engine too (it is the
    production knob): identical trade buffers vs the exact engine whenever
    no message fills more than `cap` orders."""
    cfg = LobConfig(trade_capture_cap=cap)
    rng = np.random.default_rng(7)
    msgs = np.concatenate([init_book_messages(rng),
                           random_message_stream(rng, 200)])
    exact, fast = _run_both(cfg, msgs)
    _assert_equiv(exact, fast)
