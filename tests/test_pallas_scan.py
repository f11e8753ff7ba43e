"""Pallas book-scan kernel vs the lax engines.

The kernel (ops/book_scan.py) implements the sorted-book algorithm of
lob/engine_sorted.py; a vmapped call must be bit-identical to the per-env
lax sorted scan — final book planes, trade buffer, and best-bid/ask
streams — and content-identical to the exact engine. Runs in Pallas
interpret mode on the CPU test mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jaxmarl_hft_tpu.config.structs import LobConfig, replace_cfg
from jaxmarl_hft_tpu.lob import engine, engine_sorted
from jaxmarl_hft_tpu.ops import book_scan

from reference_oracle import init_book_messages, random_message_stream

CFG = LobConfig(trade_capture_cap=16)


def _fresh(cfg=CFG):
    return (engine.init_orderside(cfg.nOrders),
            engine.init_orderside(cfg.nOrders),
            engine.init_trades(cfg.nTrades))


def _batch_streams(n_envs, n_msgs, seed0=0):
    streams = []
    for i in range(n_envs):
        rng = np.random.default_rng(seed0 + i)
        streams.append(np.concatenate([init_book_messages(rng),
                                       random_message_stream(rng, n_msgs)]))
    return jnp.asarray(np.stack(streams), jnp.int32)


def _run_pallas_and_sorted(cfg, msgs_b, n_steps):
    n_envs = msgs_b.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(7), n_envs)
    state_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_envs,) + x.shape), _fresh(cfg))

    pal = jax.jit(jax.vmap(
        lambda k, m, s: book_scan.scan_messages_save_bidask(
            cfg, k, m, s, n_steps)))(keys, msgs_b, state_b)
    srt = jax.jit(jax.vmap(
        lambda k, m, s: engine_sorted.scan_messages_save_bidask(
            cfg, k, m, s, n_steps)))(keys, msgs_b, state_b)
    return pal, srt


@pytest.mark.parametrize("seed0", [0, 10])
def test_kernel_matches_sorted_engine(seed0):
    msgs_b = _batch_streams(4, 120, seed0)
    n_steps = msgs_b.shape[1]
    (pal_state, (pal_a, pal_b)), (srt_state, (srt_a, srt_b)) = \
        _run_pallas_and_sorted(CFG, msgs_b, n_steps)
    for got, want, name in ((pal_state[0], srt_state[0], "asks"),
                            (pal_state[1], srt_state[1], "bids"),
                            (pal_state[2], srt_state[2], "trades"),
                            (pal_a, srt_a, "ask hist"),
                            (pal_b, srt_b, "bid hist")):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"{name} differ")


def test_kernel_matches_exact_engine_contents():
    """Book contents and trades also agree with the exact (slot-layout)
    engine, canonicalised by row sort."""
    msgs_b = _batch_streams(2, 150, 20)
    n_steps = msgs_b.shape[1]
    (pal_state, (pal_a, pal_b)), _ = _run_pallas_and_sorted(
        CFG, msgs_b, n_steps)
    keys = jax.random.split(jax.random.PRNGKey(7), msgs_b.shape[0])
    for e in range(msgs_b.shape[0]):
        ex_state, (ex_a, ex_b) = engine.scan_messages_save_bidask(
            CFG, keys[e], msgs_b[e], _fresh(), n_steps)

        def canon(side):
            a = np.asarray(side)
            return a[np.lexsort(a.T[::-1])]

        np.testing.assert_array_equal(canon(pal_state[0][e]),
                                      canon(ex_state[0]))
        np.testing.assert_array_equal(canon(pal_state[1][e]),
                                      canon(ex_state[1]))
        np.testing.assert_array_equal(np.asarray(pal_state[2][e]),
                                      np.asarray(ex_state[2]))
        np.testing.assert_array_equal(np.asarray(pal_a[e]), np.asarray(ex_a))
        np.testing.assert_array_equal(np.asarray(pal_b[e]), np.asarray(ex_b))


def test_kernel_type4_and_eviction_paths():
    cfg = replace_cfg(CFG, nOrders=16, nTrades=16, trade_capture_cap=8)
    rows = []
    # overfill one side to trigger eviction, then an aggressive sweep
    for i in range(18):
        rows.append([1, 1, 5, 2_000_000 + 100 * (i % 17), 100 + i, 100 + i,
                     34200, i])
    rows.append([4, 1, 40, 1_900_000, 300, 300, 34201, 0])
    rows.append([2, 1, 5, 2_000_000, 100, 100, 34202, 0])
    msgs = np.array(rows, np.int32)
    msgs_b = jnp.asarray(np.stack([msgs, msgs]), jnp.int32)
    (pal_state, _), (srt_state, _) = _run_pallas_and_sorted(
        cfg, msgs_b, msgs_b.shape[1])
    for got, want in zip(pal_state, srt_state):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_kernel_unrolled_path():
    """The TPU production path unrolls the message loop (static msgs reads +
    rec stores). Cover it in interpret mode with a small stream."""
    msgs_b = _batch_streams(2, 8, 40)[:, :24]
    n_steps = msgs_b.shape[1]
    book_scan._force_unroll = True
    book_scan._make_scan_bidask.cache_clear()
    try:
        (pal_state, (pal_a, pal_b)), (srt_state, (srt_a, srt_b)) = \
            _run_pallas_and_sorted(CFG, msgs_b, n_steps)
    finally:
        book_scan._force_unroll = None
        book_scan._make_scan_bidask.cache_clear()
    for got, want in zip(jax.tree.leaves(((pal_state), pal_a, pal_b)),
                         jax.tree.leaves(((srt_state), srt_a, srt_b))):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_unbatched_call_falls_back():
    """A non-vmapped call uses the lax sorted engine (no kernel)."""
    rng = np.random.default_rng(3)
    msgs = jnp.asarray(np.concatenate([init_book_messages(rng),
                                       random_message_stream(rng, 60)]),
                       jnp.int32)
    key = jax.random.PRNGKey(0)
    got = book_scan.scan_messages_save_bidask(CFG, key, msgs, _fresh(),
                                              msgs.shape[0])
    want = engine_sorted.scan_messages_save_bidask(CFG, key, msgs, _fresh(),
                                                   msgs.shape[0])
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_env_equivalence_pallas_vs_sorted():
    """Vmapped MARL env rollout with matching_engine='pallas' matches the
    sorted lax engine step for step."""
    from jaxmarl_hft_tpu.config.structs import MultiAgentConfig
    from jaxmarl_hft_tpu.envs.marl import MarlEnv
    from test_marl_env import make_test_config, random_actions

    cfg_s = make_test_config()
    wc_p = replace_cfg(cfg_s.world_config, matching_engine="pallas",
                       trade_capture_cap=16)
    wc_s = replace_cfg(cfg_s.world_config, matching_engine="sorted",
                       trade_capture_cap=16)
    cfg_p = MultiAgentConfig(world_config=wc_p, agents=cfg_s.agents,
                             number_of_agents_per_type=
                             cfg_s.number_of_agents_per_type)
    cfg_s = MultiAgentConfig(world_config=wc_s, agents=cfg_s.agents,
                             number_of_agents_per_type=
                             cfg_s.number_of_agents_per_type)

    env_p = MarlEnv(jax.random.PRNGKey(0), cfg_p)
    env_s = MarlEnv(jax.random.PRNGKey(0), cfg_s)
    pp, ps = env_p.default_params, env_s.default_params

    n_envs = 3
    keys = jax.random.split(jax.random.PRNGKey(5), n_envs)
    obs_p, st_p = jax.vmap(env_p.reset_env, in_axes=(0, None))(keys, pp)
    obs_s, st_s = jax.vmap(env_s.reset_env, in_axes=(0, None))(keys, ps)

    k = jax.random.PRNGKey(9)
    for _ in range(3):
        k, ak, sk = jax.random.split(k, 3)
        acts_one = random_actions(env_s, ak)
        acts = [jnp.broadcast_to(a, (n_envs,) + a.shape) for a in acts_one]
        sks = jax.random.split(sk, n_envs)
        step_p = jax.vmap(env_p.step_env, in_axes=(0, 0, 0, None))
        step_s = jax.vmap(env_s.step_env, in_axes=(0, 0, 0, None))
        obs_p, st_p, r_p, d_p, i_p = step_p(sks, st_p, acts, pp)
        obs_s, st_s, r_s, d_s, i_s = step_s(sks, st_s, acts, ps)
        for a, b in zip(r_p, r_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(st_p.world_state.best_asks),
            np.asarray(st_s.world_state.best_asks))
        np.testing.assert_array_equal(
            np.asarray(st_p.world_state.ask_raw_orders),
            np.asarray(st_s.world_state.ask_raw_orders))
        np.testing.assert_array_equal(
            np.asarray(st_p.world_state.trades),
            np.asarray(st_s.world_state.trades))
