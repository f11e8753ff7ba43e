"""LIVE end-to-end equivalence vs the upstream reference environment.

Both frameworks consume the SAME synthetic LOBSTER CSV files; the test
asserts bit-equality at every layer boundary:

  loader arrays -> precomputed reset states -> reset_env -> step_env
  (books, trades, best-price streams, world scalars, rewards, dones, obs)

This goes beyond tests/test_engine_vs_reference.py (engine only): it proves
the data pipeline, window/reset machinery, message assembly (ids, shuffle),
reward fan-out, and PRNG key-path reconstruction all match the reference.

The reference mount is required (skips otherwise); gymnax/wandb are stubbed
by tests/reference_env.py. The reference's `shuffle_action_messages` uses
jax.random.permutation, so our env runs with shuffle_via_sort=False here.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reference_env import (cached_reference_env, make_reference_env,
                           write_lobster_csvs)

from jaxmarl_hft_tpu.config.structs import (ExecConfig, MMConfig,
                                            MultiAgentConfig, WorldConfig)
from jaxmarl_hft_tpu.envs.marl import MarlEnv

EPISODE_STEPS = 8
N_DATA_MSG = 10

MM_OVR = dict(action_space="fixed_quants", observation_space="basic",
              fixed_quant_value=1)
EXEC_OVR = dict(action_space="fixed_quants_complex",
                observation_space="engineered", task="sell", task_size=100)

# construction-time reference arrays compared by the loader/reset-state
# tests — snapshot into the oracle cache (reference_env.cached_reference_env)
_ATTRS = ("base_env.messages", "base_env.start_indeces",
          "base_env.end_indeces", "base_env.books",
          "base_env.max_messages_in_episode_arr", "base_env.n_windows",
          "base_env.init_states_array")


@pytest.fixture(scope="module")
def envs(tmp_path_factory):
    root = tmp_path_factory.mktemp("shared_lobster")
    data_root = str(root / "data")
    write_lobster_csvs(data_root, seed=3)

    ref_env = cached_reference_env(
        "live_default",
        dict(mm=MM_OVR, ex=EXEC_OVR, eps=EPISODE_STEPS, ndm=N_DATA_MSG,
             data=(3, 2500), window=-1),
        lambda: make_reference_env(
            data_root, str(root / "ref_at"),
            episode_time=EPISODE_STEPS, start_resolution=EPISODE_STEPS,
            n_data_msg_per_step=N_DATA_MSG, window_selector=-1,
            mm_overrides=MM_OVR, exec_overrides=EXEC_OVR,
            key=jax.random.PRNGKey(0)),
        attr_paths=_ATTRS)

    world = WorldConfig(
        synthetic_data=False, dataPath=data_root,
        alphatradePath=str(root / "our_at"), stock="TEST", timePeriod="2024",
        ep_type="fixed_steps", episode_time=EPISODE_STEPS,
        start_resolution=EPISODE_STEPS, n_data_msg_per_step=N_DATA_MSG,
        window_selector=-1, shuffle_action_messages=True,
        shuffle_via_sort=False, use_pickles_for_init=True)
    ours = MarlEnv(jax.random.PRNGKey(0), MultiAgentConfig(
        world_config=world,
        agents=(("MarketMaking", MMConfig(**MM_OVR)),
                ("Execution", ExecConfig(**EXEC_OVR))),
        number_of_agents_per_type=(1, 1)))
    return ref_env, ours


def test_loader_arrays_match(envs):
    ref_env, ours = envs
    rb, ob = ref_env.base_env, ours.base_env
    np.testing.assert_array_equal(np.asarray(rb.messages),
                                  np.asarray(ob.messages))
    np.testing.assert_array_equal(np.asarray(rb.start_indeces),
                                  np.asarray(ob.start_indices))
    np.testing.assert_array_equal(np.asarray(rb.end_indeces),
                                  np.asarray(ob.end_indices))
    np.testing.assert_array_equal(np.asarray(rb.books),
                                  np.asarray(ob.books))
    np.testing.assert_array_equal(np.asarray(rb.max_messages_in_episode_arr),
                                  np.asarray(ob.max_messages_in_episode))
    assert rb.n_windows == ob.n_windows


def test_precomputed_reset_states_match(envs):
    ref_env, ours = envs
    ref_states = ref_env.base_env.init_states_array
    our_states = ours.base_env.init_states_array
    for name in ("ask_raw_orders", "bid_raw_orders", "trades", "init_time",
                 "window_index", "max_steps_in_episode", "start_index",
                 "step_counter"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref_states, name)),
            np.asarray(getattr(our_states, name)), err_msg=name)


def _world_fields(ws):
    return {
        "asks": ws.ask_raw_orders, "bids": ws.bid_raw_orders,
        "trades": ws.trades, "best_asks": ws.best_asks,
        "best_bids": ws.best_bids, "time": ws.time,
        "order_id_counter": ws.order_id_counter, "mid_price": ws.mid_price,
        "step_counter": ws.step_counter, "window_index": ws.window_index,
        "start_index": ws.start_index, "delta_time": ws.delta_time,
    }


def _assert_world_equal(ref_ws, our_ws):
    ref_f, our_f = _world_fields(ref_ws), _world_fields(our_ws)
    for k in ref_f:
        np.testing.assert_array_equal(np.asarray(ref_f[k]),
                                      np.asarray(our_f[k]), err_msg=k)


@pytest.mark.parametrize("seed", [0, 5])
def test_reset_bit_equal(envs, seed):
    ref_env, ours = envs
    key = jax.random.PRNGKey(seed)
    ref_obs, ref_state = ref_env.reset_env(key, ref_env.default_params)
    our_obs, our_state = ours.reset_env(key, ours.default_params)
    _assert_world_equal(ref_state.world_state, our_state.world_state)
    for ro, oo in zip(ref_obs, our_obs):
        np.testing.assert_allclose(np.asarray(ro), np.asarray(oo),
                                   rtol=0, atol=0)


def test_episode_bit_equal(envs):
    """Full episode: same keys, same actions, every step compared."""
    ref_env, ours = envs
    ref_p, our_p = ref_env.default_params, ours.default_params

    key = jax.random.PRNGKey(42)
    ref_obs, ref_state = ref_env.reset_env(key, ref_p)
    our_obs, our_state = ours.reset_env(key, our_p)

    rng = np.random.default_rng(7)
    for step in range(3 * EPISODE_STEPS):
        mm_a = jnp.asarray(rng.integers(0, 10), jnp.int32)
        ex_a = jnp.asarray(rng.integers(0, 13), jnp.int32)
        step_key = jax.random.fold_in(jax.random.PRNGKey(100), step)

        ref_out = ref_env.step_env(step_key, ref_state, [mm_a, ex_a], ref_p)
        our_out = ours.step_env(step_key, our_state, [mm_a, ex_a], our_p)
        ref_obs, ref_state, ref_rew, ref_dones, ref_info = ref_out
        our_obs, our_state, our_rew, our_dones, our_info = our_out

        _assert_world_equal(ref_state.world_state, our_state.world_state)
        for rr, orw in zip(ref_rew, our_rew):
            np.testing.assert_array_equal(np.asarray(rr), np.asarray(orw),
                                          err_msg=f"reward step {step}")
        for ro, oo in zip(ref_obs, our_obs):
            np.testing.assert_array_equal(np.asarray(ro), np.asarray(oo),
                                          err_msg=f"obs step {step}")
        assert bool(np.asarray(ref_dones["__all__"])) \
            == bool(np.asarray(our_dones["__all__"]))
        for rd, od in zip(ref_dones["agents"], our_dones["agents"]):
            np.testing.assert_array_equal(np.asarray(rd), np.asarray(od))
        if bool(np.asarray(our_dones["__all__"])):
            break

    assert bool(np.asarray(our_dones["__all__"]))  # episode completed


def test_agent_states_track_reference(envs):
    """MM inventory/cash and Exec fill counters match after trading steps."""
    ref_env, ours = envs
    ref_p, our_p = ref_env.default_params, ours.default_params
    key = jax.random.PRNGKey(11)
    _, ref_state = ref_env.reset_env(key, ref_p)
    _, our_state = ours.reset_env(key, our_p)
    for step in range(4):
        step_key = jax.random.fold_in(jax.random.PRNGKey(200), step)
        acts = [jnp.asarray(2, jnp.int32), jnp.asarray(1, jnp.int32)]
        _, ref_state, _, _, _ = ref_env.step_env(step_key, ref_state, acts,
                                                 ref_p)
        _, our_state, _, _, _ = ours.step_env(step_key, our_state, acts,
                                              our_p)
    ref_mm, our_mm = ref_state.agent_states[0], our_state.agent_states[0]
    for f in ("inventory", "cash_balance", "total_PnL"):
        np.testing.assert_array_equal(np.asarray(getattr(ref_mm, f)),
                                      np.asarray(getattr(our_mm, f)),
                                      err_msg=f"MM {f}")
    ref_ex, our_ex = ref_state.agent_states[1], our_state.agent_states[1]
    for f in ("quant_executed", "total_revenue", "is_sell_task"):
        np.testing.assert_array_equal(np.asarray(getattr(ref_ex, f)),
                                      np.asarray(getattr(our_ex, f)),
                                      err_msg=f"Exec {f}")


def test_info_dicts_match_reference(envs):
    """Per-step `info` (world fields + per-agent extras, marl_env.py:624-661)
    feeds the reference's metrics pipeline — compare every shared key
    bit-for-bit over several steps."""
    ref_env, ours = envs
    ref_p, our_p = ref_env.default_params, ours.default_params
    key = jax.random.PRNGKey(33)
    _, ref_state = ref_env.reset_env(key, ref_p)
    _, our_state = ours.reset_env(key, our_p)
    rng = np.random.default_rng(17)
    for step in range(4):
        acts = [jnp.asarray(rng.integers(0, 10), jnp.int32),
                jnp.asarray(rng.integers(0, 13), jnp.int32)]
        k = jax.random.fold_in(jax.random.PRNGKey(300), step)
        ref_out = ref_env.step_env(k, ref_state, acts, ref_p)
        our_out = ours.step_env(k, our_state, acts, our_p)
        ref_state, ref_info = ref_out[1], ref_out[4]
        our_state, our_info = our_out[1], our_out[4]

        # every reference key must be present; the only additions allowed
        # are documented repo extensions (the trade-capture exactness
        # certificate, marl.py step (D))
        extra = set(our_info["world"]) - set(ref_info["world"])
        assert set(ref_info["world"]) <= set(our_info["world"])
        assert extra <= {"trade_overflow"}, extra
        for kk in sorted(ref_info["world"]):
            np.testing.assert_array_equal(
                np.asarray(ref_info["world"][kk]),
                np.asarray(our_info["world"][kk]),
                err_msg=f"world info[{kk}] step {step}")
        for i, (ri, oi) in enumerate(zip(ref_info["agents"],
                                         our_info["agents"])):
            assert set(ri) == set(oi), (sorted(ri), sorted(oi))
            for kk in sorted(ri):
                np.testing.assert_array_equal(
                    np.asarray(ri[kk]), np.asarray(oi[kk]),
                    err_msg=f"agent[{i}] info[{kk}] step {step}")


def test_debug_mode_info_matches_reference(tmp_path):
    """debug_mode swells info with trades / step messages / L2 snapshot
    (reference marl_env.py:645-656) — compare those too."""
    root = tmp_path
    data_root = str(root / "data")
    write_lobster_csvs(data_root, seed=21, n=1500)
    ref_env = cached_reference_env(
        "live_debug",
        dict(mm=MM_OVR, ex=EXEC_OVR, eps=4, ndm=8, data=(21, 1500),
             debug=True),
        lambda: make_reference_env(
            data_root, str(root / "ra"), episode_time=4, start_resolution=4,
            n_data_msg_per_step=8, window_selector=0,
            mm_overrides=MM_OVR, exec_overrides=EXEC_OVR,
            world_overrides=dict(debug_mode=True),
            key=jax.random.PRNGKey(0)))
    ours = MarlEnv(jax.random.PRNGKey(0), MultiAgentConfig(
        world_config=WorldConfig(
            synthetic_data=False, dataPath=data_root,
            alphatradePath=str(root / "oa"), stock="TEST", timePeriod="2024",
            ep_type="fixed_steps", episode_time=4, start_resolution=4,
            n_data_msg_per_step=8, window_selector=0, debug_mode=True,
            shuffle_action_messages=True, shuffle_via_sort=False,
            use_pickles_for_init=False),
        agents=(("MarketMaking", MMConfig(**MM_OVR)),
                ("Execution", ExecConfig(**EXEC_OVR))),
        number_of_agents_per_type=(1, 1)))
    key = jax.random.PRNGKey(8)
    _, ref_state = ref_env.reset_env(key, ref_env.default_params)
    _, our_state = ours.reset_env(key, ours.default_params)
    rng = np.random.default_rng(23)
    for step in range(3):
        acts = [jnp.asarray(rng.integers(0, 10), jnp.int32),
                jnp.asarray(rng.integers(0, 13), jnp.int32)]
        k = jax.random.fold_in(jax.random.PRNGKey(500), step)
        ref_out = ref_env.step_env(k, ref_state, acts, ref_env.default_params)
        our_out = ours.step_env(k, our_state, acts, ours.default_params)
        ref_state, ref_info = ref_out[1], ref_out[4]
        our_state, our_info = our_out[1], our_out[4]
        for kk in ("trades", "total_msgs", "lob_state"):
            assert kk in ref_info["world"] and kk in our_info["world"], kk
            np.testing.assert_array_equal(
                np.asarray(ref_info["world"][kk]),
                np.asarray(our_info["world"][kk]),
                err_msg=f"debug info[{kk}] step {step}")
