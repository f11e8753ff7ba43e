"""Three heterogeneous agent types (MM + directional trader + execution):
live bit-equivalence vs the reference, and sharded IPPO training over the
CPU mesh — the BASELINE.md measurement config #5 shape.

The type registry on both sides dispatches on the config *class*
(reference marl_env.py:71-79), so a third type is a second MM-class entry
with a different action space under its own name.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reference_env import (import_reference_env, reference_available,
                           write_lobster_csvs)

from jaxmarl_hft_tpu.config.structs import (ExecConfig, MMConfig,
                                            MultiAgentConfig, WorldConfig)
from jaxmarl_hft_tpu.envs.marl import MarlEnv

EPISODE_STEPS = 4
N_DATA_MSG = 10

MM_KW = dict(action_space="fixed_quants", observation_space="basic",
             fixed_quant_value=2)
DIR_KW = dict(action_space="directional_trading", observation_space="basic",
              short_name="DIR", fixed_quant_value=3)
EX_KW = dict(action_space="fixed_quants_complex",
             observation_space="engineered", task="sell", task_size=60)


def _our_config(world_kw):
    return MultiAgentConfig(
        world_config=WorldConfig(**world_kw),
        agents=(("MarketMaking", MMConfig(**MM_KW)),
                ("Directional", MMConfig(**DIR_KW)),
                ("Execution", ExecConfig(**EX_KW))),
        number_of_agents_per_type=(1, 2, 1))


@pytest.mark.skipif(not reference_available(),
                    reason="reference mount unavailable")
def test_three_types_match_reference(tmp_path):
    ref_marl, ref_cfg = import_reference_env()
    data_root = str(tmp_path / "data")
    write_lobster_csvs(data_root, seed=13, n=2000)

    world = ref_cfg.World_EnvironmentConfig(
        n_data_msg_per_step=N_DATA_MSG, window_selector=0,
        ep_type="fixed_steps", episode_time=EPISODE_STEPS,
        start_resolution=EPISODE_STEPS, dataPath=data_root,
        alphatradePath=str(tmp_path / "ref_at"), stock="TEST",
        timePeriod="2024")
    ma = ref_cfg.MultiAgentConfig(
        world_config=world,
        dict_of_agents_configs={
            "MarketMaking": ref_cfg.MarketMaking_EnvironmentConfig(**MM_KW),
            "Directional": ref_cfg.MarketMaking_EnvironmentConfig(**DIR_KW),
            "Execution": ref_cfg.Execution_EnvironmentConfig(**EX_KW)},
        number_of_agents_per_type=[1, 2, 1])
    ref_env = ref_marl.MARLEnv(jax.random.PRNGKey(0), multi_agent_config=ma)

    ours = MarlEnv(jax.random.PRNGKey(0), _our_config(dict(
        synthetic_data=False, dataPath=data_root,
        alphatradePath=str(tmp_path / "our_at"), stock="TEST",
        timePeriod="2024", ep_type="fixed_steps",
        episode_time=EPISODE_STEPS, start_resolution=EPISODE_STEPS,
        n_data_msg_per_step=N_DATA_MSG, window_selector=0,
        shuffle_via_sort=False, use_pickles_for_init=False)))

    assert ours.num_msgs_per_step == ref_env.num_msgs_per_step
    ref_p, our_p = ref_env.default_params, ours.default_params
    # disjoint downward trader-id ranges across the three types
    tids = [np.asarray(p.trader_id) for p in our_p.agent_params]
    for ours_t, ref_t in zip(tids,
                             [np.asarray(p.trader_id)
                              for p in ref_p.agent_params]):
        np.testing.assert_array_equal(ours_t, ref_t)
    flat = np.concatenate([t.ravel() for t in tids])
    assert len(set(flat.tolist())) == len(flat)

    key = jax.random.PRNGKey(21)
    ref_obs, ref_state = ref_env.reset_env(key, ref_p)
    our_obs, our_state = ours.reset_env(key, our_p)
    for ro, oo in zip(ref_obs, our_obs):
        np.testing.assert_array_equal(np.asarray(ro), np.asarray(oo))

    rng = np.random.default_rng(4)
    n_acts = [10, 3, 13]
    n_inst = [1, 2, 1]
    for step in range(EPISODE_STEPS):
        acts = []
        for na, ni in zip(n_acts, n_inst):
            a = rng.integers(0, na, size=(ni,)).astype(np.int32)
            acts.append(jnp.asarray(a[0] if ni == 1 else a))
        k = jax.random.fold_in(jax.random.PRNGKey(400), step)
        ref_obs, ref_state, ref_r, ref_d, _ = ref_env.step_env(
            k, ref_state, acts, ref_p)
        our_obs, our_state, our_r, our_d, _ = ours.step_env(
            k, our_state, acts, our_p)
        np.testing.assert_array_equal(
            np.asarray(ref_state.world_state.bid_raw_orders),
            np.asarray(our_state.world_state.bid_raw_orders))
        for i, (rr, orr) in enumerate(zip(ref_r, our_r)):
            np.testing.assert_array_equal(np.asarray(rr), np.asarray(orr),
                                          err_msg=f"reward[{i}] step {step}")
        for ro, oo in zip(ref_obs, our_obs):
            np.testing.assert_array_equal(np.asarray(ro), np.asarray(oo))
        if bool(np.asarray(our_d["__all__"])):
            break


def test_three_types_train_sharded():
    """IPPO with three heterogeneous agent types (three networks, per-type
    hyperparameters) trains over the 8-device CPU mesh."""
    from jaxmarl_hft_tpu.parallel.mesh import make_mesh
    from jaxmarl_hft_tpu.rl.ippo import default_train_config, make_train

    env = MarlEnv(jax.random.PRNGKey(0), _our_config(dict(
        synthetic_data=True, synthetic_n_msgs=20_000,
        ep_type="fixed_steps", episode_time=EPISODE_STEPS,
        start_resolution=EPISODE_STEPS, n_data_msg_per_step=N_DATA_MSG,
        use_pickles_for_init=False)))
    cfg = default_train_config(
        NUM_ENVS=8, NUM_STEPS=4, TOTAL_TIMESTEPS=8 * 4 * 2,
        NUM_MINIBATCHES=2, UPDATE_EPOCHS=1, FC_DIM_SIZE=16,
        GRU_HIDDEN_DIM=16,
        LR=[3e-4, 1e-4, 5e-4], GAMMA=[0.99, 0.97, 0.95],
        GAE_LAMBDA=[0.95] * 3, ENT_COEF=[0.01] * 3, VF_COEF=[0.5] * 3,
        MAX_GRAD_NORM=[0.5] * 3, ANNEAL_LR=[True, False, True])
    train = make_train(cfg, env, mesh=make_mesh(8))
    out = train(jax.random.PRNGKey(1), num_updates=2)
    assert len(out["runner_state"][0]) == 3      # one TrainState per type
    for m in out["metrics"]:
        assert len(m["loss"]) == 3
        for loss in m["loss"]:
            assert np.isfinite(loss["total_loss"])
