"""Coverage: every MM and Exec action space, observation space, and reward
function runs through the full MARL step pipeline (SURVEY.md §2 L3 matrix).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jaxmarl_hft_tpu.config.structs import (ExecConfig, MMConfig,
                                            MultiAgentConfig, WorldConfig)
from jaxmarl_hft_tpu.envs.marl import MarlEnv

WORLD = dict(synthetic_data=True, synthetic_n_msgs=30_000,
             ep_type="fixed_steps", episode_time=8, start_resolution=8,
             n_data_msg_per_step=10, use_pickles_for_init=False)

MM_ACTION_SPACES = ["fixed_quants", "simple", "AvSt", "bobStrategy",
                    "bobRL", "spread_skew", "directional_trading",
                    "fixed_prices"]
EXEC_ACTION_SPACES = ["fixed_quants", "fixed_quants_complex",
                      "fixed_quants_1msg", "simplest_case", "twap",
                      "fixed_prices"]
MM_REWARDS = ["portfolio_value", "buy_sell_pnl", "complex", "zero_inv",
              "spooner", "spooner_damped", "spooner_asym_damped",
              "spooner_asym_damped2", "spooner_scaled",
              "delta_portfolio_value"]
EXEC_REWARDS = ["normal", "finish_fast", "simplest_case"]
MM_OBS = ["engineered", "basic"]
EXEC_OBS = ["engineered", "basic", "simplest_case"]


def _run_env(mm_cfg=None, exec_cfg=None, steps=3, seed=0):
    agents = []
    if mm_cfg is not None:
        agents.append(("MarketMaking", mm_cfg))
    if exec_cfg is not None:
        agents.append(("Execution", exec_cfg))
    cfg = MultiAgentConfig(world_config=WorldConfig(**WORLD),
                           agents=tuple(agents),
                           number_of_agents_per_type=(1,) * len(agents))
    env = MarlEnv(jax.random.PRNGKey(0), cfg)
    params = env.default_params
    key = jax.random.PRNGKey(seed)
    obs, state = env.reset_env(key, params)
    for _ in range(steps):
        key, ak, sk = jax.random.split(key, 3)
        actions = []
        for i, sp in enumerate(env.action_spaces):
            a = sp.sample(jax.random.fold_in(ak, i))
            actions.append(a)
        obs, state, rewards, dones, info = env.step_env(sk, state, actions,
                                                        params)
        for r in rewards:
            assert np.all(np.isfinite(np.asarray(r))), r
        for o in obs:
            assert np.all(np.isfinite(np.asarray(o))), o
    return env, obs, state, rewards


MM_BASE = dict(observation_space="basic", fixed_quant_value=1,
               auto_liquidate_threshold=0, unwind_price_penalty=0)


@pytest.mark.parametrize("space", MM_ACTION_SPACES)
def test_mm_action_space(space):
    kw = dict(MM_BASE, action_space=space)
    if space == "fixed_prices":
        kw["n_actions"] = 4
    env, obs, state, rewards = _run_env(mm_cfg=MMConfig(**kw))
    assert obs[0].shape == (1, 2)


@pytest.mark.parametrize("space", EXEC_ACTION_SPACES)
def test_exec_action_space(space):
    kw = dict(action_space=space, observation_space="basic", task_size=50)
    if space == "fixed_prices":
        kw["n_actions"] = 4
    env, obs, state, rewards = _run_env(exec_cfg=ExecConfig(**kw))
    assert obs[0].shape == (1, 3)


@pytest.mark.parametrize("reward", MM_REWARDS)
def test_mm_reward_function(reward):
    kw = dict(MM_BASE, action_space="fixed_quants", reward_function=reward)
    _run_env(mm_cfg=MMConfig(**kw))


@pytest.mark.parametrize("penalty", ["none", "linear", "quadratic",
                                     "threshold"])
def test_mm_inventory_penalty(penalty):
    kw = dict(MM_BASE, action_space="fixed_quants", inv_penalty=penalty)
    _run_env(mm_cfg=MMConfig(**kw))


@pytest.mark.parametrize("reward", EXEC_REWARDS)
def test_exec_reward_function(reward):
    _run_env(exec_cfg=ExecConfig(action_space="fixed_quants_complex",
                                 observation_space="basic", task_size=50,
                                 reward_function=reward))


@pytest.mark.parametrize("obs_space", MM_OBS)
def test_mm_obs_space(obs_space):
    kw = dict(MM_BASE, action_space="fixed_quants",
              observation_space=obs_space)
    env, obs, state, rewards = _run_env(mm_cfg=MMConfig(**kw))
    expected = env.observation_spaces[0].shape[0]
    assert obs[0].shape == (1, expected)


@pytest.mark.parametrize("obs_space", EXEC_OBS)
def test_exec_obs_space(obs_space):
    env, obs, state, rewards = _run_env(
        exec_cfg=ExecConfig(action_space="fixed_quants_complex",
                            observation_space=obs_space, task_size=50))
    expected = env.observation_spaces[0].shape[0]
    assert obs[0].shape == (1, expected)


@pytest.mark.parametrize("ref_price", ["mid", "mid_avg", "far_touch",
                                       "near_touch"])
def test_mm_reference_price(ref_price):
    kw = dict(MM_BASE, action_space="fixed_quants",
              reference_price=ref_price)
    _run_env(mm_cfg=MMConfig(**kw))


@pytest.mark.parametrize("task", ["buy", "sell", "random"])
def test_exec_task_direction(task):
    env, obs, state, rewards = _run_env(
        exec_cfg=ExecConfig(action_space="fixed_quants_complex",
                            observation_space="basic", task_size=50,
                            task=task))
    ist = int(state.agent_states[0].is_sell_task[0])
    if task == "buy":
        assert ist == 0
    elif task == "sell":
        assert ist == 1


def test_mm_auto_liquidate_path():
    kw = dict(MM_BASE, action_space="fixed_quants",
              auto_liquidate_threshold=5)
    _run_env(mm_cfg=MMConfig(**kw))


def test_fixed_time_mode():
    world = dict(WORLD, ep_type="fixed_time", episode_time=600,
                 start_resolution=600)
    cfg = MultiAgentConfig(
        world_config=WorldConfig(**world),
        agents=(("MarketMaking",
                 MMConfig(action_space="fixed_quants",
                          observation_space="engineered",
                          **{k: v for k, v in MM_BASE.items()
                             if k != "observation_space"})),
                ("Execution",
                 ExecConfig(action_space="fixed_quants_complex",
                            observation_space="engineered", task_size=50))),
        number_of_agents_per_type=(1, 1))
    env = MarlEnv(jax.random.PRNGKey(0), cfg)
    params = env.default_params
    key = jax.random.PRNGKey(1)
    obs, state = env.reset_env(key, params)
    # fixed_time engineered obs: MM 10 features, Exec 15
    assert obs[0].shape == (1, 10)
    assert obs[1].shape == (1, 15)
    key, ak, sk = jax.random.split(key, 3)
    actions = [env.action_spaces[0].sample(ak),
               env.action_spaces[1].sample(ak)]
    obs, state, rewards, dones, info = env.step_env(sk, state, actions,
                                                    params)
    assert np.all(np.isfinite(np.asarray(obs[0])))


def test_mm_tokenizer_obs_space():
    """Self-contained tokenized book+message observation
    (reference mm_env.py:2824-2959, with the external lobgen config replaced
    by envs/tokenizer.TokenizerConfig)."""
    kw = dict(MM_BASE, action_space="fixed_quants",
              observation_space="messages_new_tokenizer")
    env, obs, state, rewards = _run_env(mm_cfg=MMConfig(**kw))
    expected = env.observation_spaces[0].shape[0]
    o = np.asarray(obs[0])
    assert o.shape == (1, expected)
    from jaxmarl_hft_tpu.envs.tokenizer import TokenizerConfig
    assert o.min() >= 0 and o.max() < TokenizerConfig().TOTAL_NUM_TOKENS


def test_mm_messages_obs_space():
    """Raw-message observation space runs end-to-end (incl. blank window on
    reset)."""
    kw = dict(MM_BASE, action_space="fixed_quants",
              observation_space="messages")
    env, obs, state, rewards = _run_env(mm_cfg=MMConfig(**kw))
    n_msgs = env.num_msgs_per_step
    assert np.asarray(obs[0]).shape == (1, n_msgs, 8)


def test_mm_messages_obs_space_multi_type():
    """Message-window observations in a MULTI-TYPE config: the window covers
    ALL types' step messages (num_msgs_per_step rows), reset and step obs
    shapes agree (auto-reset tree-select needs that), and the done-mask
    zeroing broadcasts over the rank-3 obs."""
    kw = dict(MM_BASE, action_space="fixed_quants",
              observation_space="messages")
    env, obs, state, rewards = _run_env(
        mm_cfg=MMConfig(**kw),
        exec_cfg=ExecConfig(action_space="fixed_quants_complex",
                            observation_space="engineered", task_size=20),
        steps=10)
    n_msgs = env.num_msgs_per_step
    assert env.observation_spaces[0].shape == (n_msgs, 8)
    assert np.asarray(obs[0]).shape == (1, n_msgs, 8)
    # auto-resetting step: the tree-select between stepped and reset obs
    # requires both branches to have identical shapes
    acts = [sp.sample(jax.random.PRNGKey(3)) for sp in env.action_spaces]
    obs2, *_ = env.step(jax.random.PRNGKey(4), state, acts,
                        env.default_params)
    assert np.asarray(obs2[0]).shape == (1, n_msgs, 8)


def test_mm_tokenizer_obs_space_multi_type():
    kw = dict(MM_BASE, action_space="fixed_quants",
              observation_space="messages_new_tokenizer")
    env, obs, state, rewards = _run_env(
        mm_cfg=MMConfig(**kw),
        exec_cfg=ExecConfig(action_space="fixed_quants_complex",
                            observation_space="engineered", task_size=20),
        steps=10)
    expected = env.observation_spaces[0].shape[0]
    assert np.asarray(obs[0]).shape == (1, expected)


def test_mm_fixed_prices_invalid_n_actions_derived():
    """The inherited defaults (exec 5 / MM 10) are invalid for the 1-4-level
    fixed_prices ladders; __post_init__ derives a valid count instead of
    crashing at trace time."""
    assert ExecConfig(action_space="fixed_prices").n_actions == 4
    assert ExecConfig(action_space="fixed_prices", n_actions=3).n_actions == 3
    assert MMConfig(action_space="fixed_prices").n_actions == 8
    assert MMConfig(action_space="fixed_prices", n_actions=6).n_actions == 6
    assert MMConfig(action_space="fixed_prices", n_actions=7).n_actions == 8


def test_tokenizer_event_tokens_stay_in_band():
    """Ask-side (direction=-1) event tokens must stay inside the 64-token
    event band and keep the side distinguishable (the reference's uint8
    expression wraps -1 to 252+event, aliasing order-id tokens)."""
    from jaxmarl_hft_tpu.envs.tokenizer import (TokenizerConfig,
                                                tokenize_messages)
    tok = TokenizerConfig()
    msgs = jnp.asarray([
        [1, -1, 5, 1000, 7, 7, 34200, 0],     # ask add
        [1, 1, 5, 900, 8, 8, 34200, 100],     # bid add
        [0, 0, 0, 0, 0, 0, 0, 0],             # noop pad
    ], jnp.int32)
    bb = jnp.zeros((3, 2), jnp.int32)
    toks = np.asarray(tokenize_messages(tok, msgs, bb, bb, 0)).reshape(3, 13)
    ev = toks[:, 0]
    assert ev[0] == 1 and ev[1] == 5 and ev[2] == 0   # ask=1, bid=5, pad=0
    assert (ev < tok.ORDER_ID_B_START).all()


def test_tokenizer_roundtrip_bit_exact():
    """Round-5 decodability pin (VERDICT r4 item 8): every field a token
    stream encodes is recoverable bit-exactly — detokenize(tokenize(x)) ==
    x for the message fields (incl. negative order ids / delta prices
    through the masked-halves uint32 reassembly) and for the book tokens
    (time + L2 state). The reference ships no decoder (its tokenizer path
    cannot run at all, mm_env.py:143-144)."""
    from jaxmarl_hft_tpu.envs.tokenizer import (
        TokenizerConfig, detokenize_book, detokenize_messages,
        tokenize_book, tokenize_messages)
    tok = TokenizerConfig()
    rng = np.random.default_rng(5)

    n = 64
    msgs = np.zeros((n, 8), np.int64)
    msgs[:, 0] = rng.integers(1, 5, n)                     # type 1-4
    msgs[:, 1] = rng.choice([-1, 1], n)                    # side
    msgs[:, 2] = rng.integers(0, 500, n)                   # quant
    msgs[:, 3] = rng.integers(-1, 4_000_000, n) * 100      # price (some <0)
    msgs[:, 4] = rng.integers(-(2**30), 2**30, n)          # order id +/-
    msgs[:, 5] = rng.integers(-200, 200, n)                # trader id
    msgs[:, 6] = np.sort(rng.integers(34200, 57600, n))    # time s (sorted)
    msgs[:, 7] = rng.integers(0, 1_000_000_000, n)         # time ns
    msgs[rng.integers(0, n, 5)] = 0                        # noop pads
    msgs = jnp.asarray(msgs, jnp.int32)
    bb = jnp.asarray(rng.integers(0, 4_000_000, (n, 2)) * 100, jnp.int32)
    ba = jnp.asarray(np.asarray(bb) + 100, jnp.int32)

    toks = tokenize_messages(tok, msgs, bb, ba, 2000_00)
    dec = detokenize_messages(tok, toks)
    m = np.asarray(msgs)
    noop = m[:, 0] == 0
    np.testing.assert_array_equal(np.asarray(dec["event"]), m[:, 0])
    np.testing.assert_array_equal(np.asarray(dec["direction_bit"]),
                                  np.where(noop, 0, m[:, 1] == 1))
    np.testing.assert_array_equal(np.asarray(dec["order_id"]), m[:, 4])
    np.testing.assert_array_equal(np.asarray(dec["price_ticks"]),
                                  m[:, 3] // 100)
    np.testing.assert_array_equal(np.asarray(dec["size"]), m[:, 2])
    # delta encodings reassemble to the values tokenize computed
    ds = m[1:, 6] - m[:-1, 6]
    dns = m[1:, 7] - m[:-1, 7]
    ds = ds - (dns < 0)
    dns = np.where(dns < 0, dns + 1_000_000_000, dns)
    np.testing.assert_array_equal(np.asarray(dec["delta_time_s"])[1:], ds)
    np.testing.assert_array_equal(np.asarray(dec["delta_time_ns"])[1:], dns)
    bbv = np.asarray(bb)[:, 0] // 100
    bav = np.asarray(ba)[:, 0] // 100
    exp_dp = (bav[1:] - bav[:-1]) + (bbv[1:] - bbv[:-1])
    np.testing.assert_array_equal(
        np.asarray(dec["delta_price_ticks"])[1:], exp_dp)

    # book tokens: time + 40 L2 fields, bit-exact both ways
    l2 = jnp.asarray(rng.integers(-1, 4_000_000, (40,)), jnp.int32)
    time = jnp.asarray([45123, 987654321], jnp.int32)
    btoks = tokenize_book(tok, l2, time)
    t2, l2_dec = detokenize_book(tok, btoks, n_levels=10)
    np.testing.assert_array_equal(np.asarray(t2), np.asarray(time))
    np.testing.assert_array_equal(np.asarray(l2_dec), np.asarray(l2))

    # band disjointness: every token lands inside its field's band
    tk = np.asarray(toks).reshape(-1, 13)
    assert (tk[:, 0] < tok.ORDER_ID_B_START).all()
    for cols, lo, hi in [((1, 2), tok.ORDER_ID_B_START, tok.PRICE_B_START),
                         ((3, 4, 11, 12), tok.PRICE_B_START,
                          tok.SIZE_B_START),
                         ((5, 6), tok.SIZE_B_START, tok.TIME_B_START),
                         ((7, 8, 9, 10), tok.TIME_B_START,
                          tok.TOTAL_NUM_TOKENS)]:
        for c in cols:
            assert (tk[:, c] >= lo).all() and (tk[:, c] < hi).all(), c
