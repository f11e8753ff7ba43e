"""Combo matrix vs the LIVE reference env: every MM / Exec action space,
every reward function, multi-instance vmap, random exec task, and
fixed_time episodes — each run step-for-step bit-identical.

Complements test_env_vs_reference_live.py (single default combo, layer-by-
layer): here the surface area is width. One shared CSV dataset; one env
pair per combo. MM `fixed_prices` and `messages*` obs are excluded: the
reference's bodies are dead/broken there (mm_env.py:1563-1665 references
undefined names under vmap; tokenizer obs imports a missing module) —
ours implements them working, so there is nothing upstream to compare to.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reference_env import (cached_reference_env, make_reference_env,
                           write_lobster_csvs)

from jaxmarl_hft_tpu.config.structs import (ExecConfig, MMConfig,
                                            MultiAgentConfig, WorldConfig)
from jaxmarl_hft_tpu.envs.marl import MarlEnv

EPISODE_STEPS = 4
N_DATA_MSG = 10
DATA_SEED, DATA_N = 9, 2000


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("matrix_lobster")
    write_lobster_csvs(str(root / "data"), seed=DATA_SEED, n=DATA_N)
    return root


def _build_pair(data_root, mm=None, ex=None, n_per_type=None, world=None,
                tag=""):
    """Build (reference env — cached record/replay oracle, see
    reference_env.cached_reference_env — and our live env) with matching
    configs."""
    our_agents = []
    if mm is not None:
        our_agents.append(("MarketMaking", MMConfig(**mm)))
    if ex is not None:
        our_agents.append(("Execution", ExecConfig(**ex)))
    if n_per_type is None:
        n_per_type = (1,) * len(our_agents)
    world = dict(world or {})

    ref_env = cached_reference_env(
        f"matrix_{tag}",
        dict(mm=mm, ex=ex, world=world, n_per_type=tuple(n_per_type),
             eps=EPISODE_STEPS, ndm=N_DATA_MSG, data=(DATA_SEED, DATA_N)),
        lambda: make_reference_env(
            str(data_root / "data"), str(data_root / f"ref_at_{tag}"),
            episode_time=EPISODE_STEPS, start_resolution=EPISODE_STEPS,
            n_data_msg_per_step=N_DATA_MSG, window_selector=0,
            mm_overrides=mm, exec_overrides=ex,
            world_overrides=world, n_per_type=n_per_type,
            key=jax.random.PRNGKey(0)))

    wc_kwargs = dict(
        synthetic_data=False, dataPath=str(data_root / "data"),
        alphatradePath=str(data_root / f"our_at_{tag}"),
        stock="TEST", timePeriod="2024", ep_type="fixed_steps",
        episode_time=EPISODE_STEPS, start_resolution=EPISODE_STEPS,
        n_data_msg_per_step=N_DATA_MSG, window_selector=0,
        shuffle_action_messages=True, shuffle_via_sort=False,
        use_pickles_for_init=False)
    wc_kwargs.update(world)
    wc = WorldConfig(**wc_kwargs)
    ours = MarlEnv(jax.random.PRNGKey(0), MultiAgentConfig(
        world_config=wc, agents=tuple(our_agents),
        number_of_agents_per_type=tuple(n_per_type)))
    return ref_env, ours


def _compare_episode(ref_env, ours, n_actions_per_type, n_per_type,
                     n_steps=EPISODE_STEPS, seed=1):
    ref_p, our_p = ref_env.default_params, ours.default_params
    key = jax.random.PRNGKey(seed)
    ref_obs, ref_state = ref_env.reset_env(key, ref_p)
    our_obs, our_state = ours.reset_env(key, our_p)
    for ro, oo in zip(ref_obs, our_obs):
        np.testing.assert_array_equal(np.asarray(ro), np.asarray(oo),
                                      err_msg="reset obs")

    rng = np.random.default_rng(seed)
    for step in range(n_steps):
        acts = []
        for na, n_inst in zip(n_actions_per_type, n_per_type):
            a = rng.integers(0, na, size=(n_inst,)).astype(np.int32)
            acts.append(jnp.asarray(a[0] if n_inst == 1 else a))
        k = jax.random.fold_in(jax.random.PRNGKey(300 + seed), step)
        ref_obs, ref_state, ref_r, ref_d, _ = ref_env.step_env(
            k, ref_state, acts, ref_p)
        our_obs, our_state, our_r, our_d, _ = ours.step_env(
            k, our_state, acts, our_p)
        np.testing.assert_array_equal(
            np.asarray(ref_state.world_state.ask_raw_orders),
            np.asarray(our_state.world_state.ask_raw_orders),
            err_msg=f"asks step {step}")
        np.testing.assert_array_equal(
            np.asarray(ref_state.world_state.trades),
            np.asarray(our_state.world_state.trades),
            err_msg=f"trades step {step}")
        for i, (rr, orr) in enumerate(zip(ref_r, our_r)):
            np.testing.assert_array_equal(np.asarray(rr), np.asarray(orr),
                                          err_msg=f"reward[{i}] step {step}")
        for i, (ro, oo) in enumerate(zip(ref_obs, our_obs)):
            np.testing.assert_array_equal(np.asarray(ro), np.asarray(oo),
                                          err_msg=f"obs[{i}] step {step}")
        assert bool(np.asarray(ref_d["__all__"])) \
            == bool(np.asarray(our_d["__all__"])), f"done step {step}"
        if bool(np.asarray(our_d["__all__"])):
            break


MM_SPACES = [("fixed_quants", 10), ("simple", 4), ("AvSt", 8),
             ("bobStrategy", 5), ("bobRL", 3), ("spread_skew", 6),
             ("directional_trading", 3)]


@pytest.mark.parametrize("space,n_actions", MM_SPACES,
                         ids=[s for s, _ in MM_SPACES])
def test_mm_action_space_matches_reference(data_root, space, n_actions):
    mm = dict(action_space=space, observation_space="basic",
              fixed_quant_value=2)
    ref_env, ours = _build_pair(data_root, mm=mm, tag=f"mm_{space}")
    assert ours.action_spaces[0].n == n_actions, \
        (space, ours.action_spaces[0].n)
    _compare_episode(ref_env, ours, [n_actions], (1,))


# exec "fixed_quants" is excluded: the reference's _getActionMsgs_fixedQuant
# returns a bare array (exec_env.py:702) where get_messages unpacks a
# (msgs, extras) tuple (exec_env.py:1239) — configuring it crashes the
# reference itself. Ours implements it working (tests/test_agent_spaces.py).
EXEC_SPACES = [("fixed_quants_complex", 13),
               ("fixed_quants_1msg", 5), ("simplest_case", 3), ("twap", 1)]


@pytest.mark.parametrize("space,n_actions", EXEC_SPACES,
                         ids=[s for s, _ in EXEC_SPACES])
def test_exec_action_space_matches_reference(data_root, space, n_actions):
    ex = dict(action_space=space, observation_space="basic", task="sell",
              task_size=60)
    ref_env, ours = _build_pair(data_root, ex=ex, tag=f"ex_{space}")
    _compare_episode(ref_env, ours, [n_actions], (1,))


MM_VARIANTS = [
    ("bobRL_v2", dict(action_space="bobRL", bob_v0=2), 5),
    ("fq_ninth", dict(action_space="fixed_quants", tenth_action="NA"), 9),
    ("simple_sellbuyall", dict(action_space="simple",
                               sell_buy_all_option=True), 4),
    ("simple_nonothing", dict(action_space="simple",
                              simple_nothing_action=False), 3),
]


@pytest.mark.parametrize("tag,overrides,n_actions", MM_VARIANTS,
                         ids=[t for t, _, _ in MM_VARIANTS])
def test_mm_action_variants_match_reference(data_root, tag, overrides,
                                            n_actions):
    mm = dict(observation_space="basic", fixed_quant_value=2, **overrides)
    ref_env, ours = _build_pair(data_root, mm=mm, tag=f"mmv_{tag}")
    assert ours.action_spaces[0].n == n_actions
    _compare_episode(ref_env, ours, [n_actions], (1,))


@pytest.mark.parametrize("task_size", [60, 8], ids=["uncapped", "capped"])
def test_exec_fixed_prices_matches_reference(data_root, task_size):
    """Exec 'fixed_prices': MultiDiscrete quantity vector per price level,
    proportionally capped to the remaining task (exec_env.py:1001-1123);
    task_size=8 forces the cap branch. n_actions must be <= 4 upstream: the
    price-ladder builders handle only 1-4 levels and silently return None
    for the config default of 5 (exec_env.py:1048-1076)."""
    ex = dict(action_space="fixed_prices", observation_space="engineered",
              task="sell", task_size=task_size, fixed_quant_value=4,
              n_actions=4)
    ref_env, ours = _build_pair(data_root, ex=ex, tag=f"exfp{task_size}")
    ref_p, our_p = ref_env.default_params, ours.default_params
    key = jax.random.PRNGKey(2)
    _, ref_state = ref_env.reset_env(key, ref_p)
    _, our_state = ours.reset_env(key, our_p)
    n_levels = ours.agent_configs[0].n_actions
    rng = np.random.default_rng(2)
    for step in range(EPISODE_STEPS):
        a = jnp.asarray(rng.integers(0, 4, size=(n_levels,)), jnp.int32)
        k = jax.random.fold_in(jax.random.PRNGKey(303), step)
        ro, ref_state, rr, rd, _ = ref_env.step_env(k, ref_state, [a], ref_p)
        oo, our_state, orr, od, _ = ours.step_env(k, our_state, [a], our_p)
        np.testing.assert_array_equal(
            np.asarray(ref_state.world_state.ask_raw_orders),
            np.asarray(our_state.world_state.ask_raw_orders))
        np.testing.assert_array_equal(np.asarray(rr[0]), np.asarray(orr[0]))
        np.testing.assert_array_equal(np.asarray(ro[0]), np.asarray(oo[0]))
        if bool(np.asarray(od["__all__"])):
            break


MM_REWARDS = ["portfolio_value", "buy_sell_pnl", "complex", "zero_inv",
              "spooner", "spooner_damped", "spooner_asym_damped",
              "spooner_scaled", "delta_portfolio_value"]


@pytest.mark.parametrize("reward", MM_REWARDS)
def test_mm_reward_matches_reference(data_root, reward):
    mm = dict(action_space="fixed_quants", observation_space="basic",
              reward_function=reward, fixed_quant_value=2,
              inv_penalty="quadratic", volume_traded_bonus="linear")
    ref_env, ours = _build_pair(data_root, mm=mm, tag=f"mmr_{reward}")
    _compare_episode(ref_env, ours, [10], (1,))


@pytest.mark.parametrize("reward", ["normal", "finish_fast",
                                    "simplest_case"])
def test_exec_reward_matches_reference(data_root, reward):
    ex = dict(action_space="fixed_quants_complex",
              observation_space="engineered",
              reward_function=reward, task="buy", task_size=60,
              reward_lambda=0.5)
    ref_env, ours = _build_pair(data_root, ex=ex, tag=f"exr_{reward}")
    _compare_episode(ref_env, ours, [13], (1,))


def test_mm_reward_shaping_knobs_match_reference(data_root):
    """Kitchen-sink of MM reward-shaping options in one combo: alternative
    reference/unwind prices, reward clipping, extreme-spread zeroing,
    threshold inventory penalty, market-share bonus, custom rebate."""
    mm = dict(action_space="fixed_quants", observation_space="basic",
              reward_function="spooner_asym_damped2", fixed_quant_value=2,
              reference_price="mid_avg", unwind_price="far_touch",
              clip_reward=True, exclude_extreme_spreads=True,
              inv_penalty="threshold", inv_penalty_threshold=3.0,
              volume_traded_bonus="linear", rebate_bps=20.0,
              unwind_price_penalty=11)
    ref_env, ours = _build_pair(data_root, mm=mm, tag="mmknobs")
    _compare_episode(ref_env, ours, [10], (1,))


def test_mm_auto_liquidate_matches_reference(data_root):
    """auto_liquidate_threshold: |inventory| above the threshold forces an
    IOC unwind order of alpha*inventory (mm_env.py:1086-1094)."""
    mm = dict(action_space="fixed_quants", observation_space="basic",
              fixed_quant_value=5, auto_liquidate_threshold=2,
              auto_liquidate_alpha=0.5)
    ref_env, ours = _build_pair(data_root, mm=mm, tag="mmliq")
    # bias actions toward one-sided fills so inventory builds up fast
    ref_p, our_p = ref_env.default_params, ours.default_params
    key = jax.random.PRNGKey(3)
    _, ref_state = ref_env.reset_env(key, ref_p)
    _, our_state = ours.reset_env(key, our_p)
    for step in range(EPISODE_STEPS):
        a = jnp.asarray(0, jnp.int32)   # quote at best both sides
        k = jax.random.fold_in(jax.random.PRNGKey(302), step)
        _, ref_state, ref_r, ref_d, _ = ref_env.step_env(k, ref_state, [a],
                                                         ref_p)
        _, our_state, our_r, our_d, _ = ours.step_env(k, our_state, [a],
                                                      our_p)
        np.testing.assert_array_equal(
            np.asarray(ref_state.agent_states[0].inventory),
            np.asarray(our_state.agent_states[0].inventory))
        np.testing.assert_array_equal(np.asarray(ref_r[0]),
                                      np.asarray(our_r[0]))
        if bool(np.asarray(our_d["__all__"])):
            break


def test_exec_pricing_knobs_match_reference(data_root):
    """Exec price-ladder knobs: far_touch reference price (the unwind path
    accepts only mid/far_touch — near_touch and the config-advertised
    best_bid_ask both raise, exec_env.py:1576-1580), larger far-touch
    quantity, deeper passive level, heavy doom penalty, drift weight."""
    ex = dict(action_space="fixed_quants_complex",
              observation_space="engineered", task="sell", task_size=40,
              reference_price="far_touch", larger_far_touch_quant=True,
              n_ticks_in_book=3, doom_price_penalty=20, reward_lambda=1.0)
    ref_env, ours = _build_pair(data_root, ex=ex, tag="exknobs")
    _compare_episode(ref_env, ours, [13], (1,))


def test_multi_instance_matches_reference(data_root):
    """3 MM + 2 Exec instances: vmapped agent axes + disjoint trader ids."""
    mm = dict(action_space="fixed_quants", observation_space="basic",
              fixed_quant_value=1)
    ex = dict(action_space="fixed_quants_complex",
              observation_space="engineered", task="sell", task_size=40)
    ref_env, ours = _build_pair(data_root, mm=mm, ex=ex, n_per_type=(3, 2),
                                tag="multi")
    _compare_episode(ref_env, ours, [10, 13], (3, 2))


def test_random_task_matches_reference(data_root):
    """task='random' samples buy/sell from the reset key — same key, same
    draw, same downstream trajectories."""
    ex = dict(action_space="fixed_quants_complex",
              observation_space="engineered", task="random", task_size=60)
    ref_env, ours = _build_pair(data_root, ex=ex, tag="rand")
    for seed in (1, 2, 3):
        _compare_episode(ref_env, ours, [13], (1,), seed=seed)


@pytest.mark.parametrize("norm", [True, False], ids=["norm", "raw"])
def test_mm_engineered_obs_matches_reference(data_root, norm):
    """MM 'engineered' observation vector (10 features fixed_steps /
    8 fixed_time, mm_env.py:3004-3154) incl. the manual mean/std
    normalization + ravel flatten (:3157-3167)."""
    mm = dict(action_space="fixed_quants", observation_space="engineered",
              normalize=norm, fixed_quant_value=2)
    ref_env, ours = _build_pair(data_root, mm=mm,
                                tag=f"mmeng_{int(norm)}")
    _compare_episode(ref_env, ours, [10], (1,))


def test_mm_messages_obs_matches_reference(data_root):
    """MM 'messages' obs space: raw step messages + the any_message_obs_space
    L2-before path (marl_env.py:224-233). Step observations are
    bit-identical. At RESET the reference returns literal None
    (_get_obs_msg(None): blank messages are built only for the tokenizer
    space, mm_env.py:436-447 -> :2818-2820), so the reference's reset obs
    cannot be batched by the RL layer; ours returns
    the zero message block instead (documented deviation)."""
    mm = dict(action_space="fixed_quants", observation_space="messages",
              fixed_quant_value=1)
    ref_env, ours = _build_pair(data_root, mm=mm, tag="mmmsg")
    ref_p, our_p = ref_env.default_params, ours.default_params
    key = jax.random.PRNGKey(1)
    ref_obs, ref_state = ref_env.reset_env(key, ref_p)
    our_obs, our_state = ours.reset_env(key, our_p)
    assert ref_obs[0] is None                      # upstream quirk
    assert np.asarray(our_obs[0]).sum() == 0       # usable zeros instead

    rng = np.random.default_rng(1)
    for step in range(EPISODE_STEPS):
        a = jnp.asarray(rng.integers(0, 10), jnp.int32)
        k = jax.random.fold_in(jax.random.PRNGKey(301), step)
        ref_obs, ref_state, ref_r, ref_d, _ = ref_env.step_env(
            k, ref_state, [a], ref_p)
        our_obs, our_state, our_r, our_d, _ = ours.step_env(
            k, our_state, [a], our_p)
        np.testing.assert_array_equal(np.asarray(ref_obs[0]),
                                      np.asarray(our_obs[0]),
                                      err_msg=f"msg obs step {step}")
        np.testing.assert_array_equal(np.asarray(ref_r[0]),
                                      np.asarray(our_r[0]))
        if bool(np.asarray(our_d["__all__"])):
            break


def test_fixed_time_matches_reference(data_root):
    """ep_type='fixed_time': episode end by wall-clock seconds, data messages
    zeroed past the episode end time (reference base_env.py:339-369)."""
    mm = dict(action_space="fixed_quants", observation_space="basic",
              fixed_quant_value=1)
    ref_env, ours = _build_pair(
        data_root, mm=mm,
        world=dict(ep_type="fixed_time", episode_time=120),
        tag="ftime")
    _compare_episode(ref_env, ours, [10], (1,), n_steps=12)


def test_no_shuffle_matches_reference(data_root):
    mm = dict(action_space="fixed_quants", observation_space="basic",
              fixed_quant_value=2)
    ref_env, ours = _build_pair(
        data_root, mm=mm, world=dict(shuffle_action_messages=False),
        tag="noshuf")
    _compare_episode(ref_env, ours, [10], (1,))
