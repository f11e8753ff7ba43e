"""Baseline policies and the learned-vs-baseline evaluation harness.

Parity reference: gymnax_exchange/jaxrl/MARL/baseline_eval/baseline_JAXMARL
.py — RandomPolicy / FixedAction policies with network-compatible signatures
(:367-399), checkpoint restore (:502-585), and evaluation over all
2^n_types Learned/Baseline combinations (:819-943). Scripted domain baselines
(AvSt for market making, TWAP for execution) are realised as env-side action
spaces, exactly as in the reference (BASELINE_CONFIGS pattern): evaluating a
baseline agent type means constructing the env with that type's action space
set to the scripted strategy and driving it with a trivial policy.
"""
from __future__ import annotations

import itertools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.structs import MultiAgentConfig, replace_cfg
from ..envs.marl import MarlEnv
from .ippo import batchify, unbatchify, _action_dims
from .networks import ScannedRNN


class RandomPolicy:
    """Uniform-random policy with the network's (params, hstate, ac_in)
    signature (reference: baseline_JAXMARL.py:367-382)."""

    def __init__(self, action_space):
        self.action_space = action_space

    def apply(self, params, hstate, ac_in, *, key):
        obs, dones = ac_in
        n = obs.shape[1]
        keys = jax.random.split(key, n)
        action = jax.vmap(self.action_space.sample)(keys)[None]
        return hstate, action, jnp.zeros(obs.shape[:2])


class FixedActionPolicy:
    """Always returns a fixed action (reference: baseline_JAXMARL.py:384-399).
    Combined with a scripted action space (AvSt / twap) this yields the
    domain baselines."""

    def __init__(self, action, action_space=None):
        self.action = action

    def apply(self, params, hstate, ac_in, *, key):
        obs, dones = ac_in
        n = obs.shape[1]
        action = jnp.full((1, n), self.action, dtype=jnp.int32)
        return hstate, action, jnp.zeros(obs.shape[:2])


class LearnedPolicy:
    """Wraps a trained ActorCriticRNN; samples from the policy, or takes the
    distribution mode when ``deterministic`` (greedy evaluation — the
    reference's CALC_EVAL scan only ever samples,
    ippo_rnn_JAXMARL.py:876-975; the mode option is an addition)."""

    def __init__(self, network, params, deterministic: bool = False):
        self.network = network
        self.params = params
        self.deterministic = deterministic

    def apply(self, params, hstate, ac_in, *, key):
        hstate, pi, value = self.network.apply(self.params, hstate, ac_in)
        action = pi.mode() if self.deterministic else pi.sample(seed=key)
        return hstate, action, value


def rollout(env: MarlEnv, policies: List[Any], num_envs: int, num_steps: int,
            *, seed: int = 0, gru_dim: int = 64):
    """Scan a batched rollout under the given per-type policies; returns
    (rewards (T, n_types list), dones, infos, actions) (reference: the eval
    _env_step scan, baseline_JAXMARL.py:624-679 — which pickles the full
    traj_batch; actions are returned here so trajectory dumps feed the
    per-episode plot suite)."""
    params = env.default_params
    n_per_type = list(env.config.number_of_agents_per_type)
    rng = jax.random.PRNGKey(seed)
    rng, _rng = jax.random.split(rng)
    reset_rng = jax.random.split(_rng, num_envs)
    obsv, env_state = jax.vmap(env.reset, in_axes=(0, None))(reset_rng,
                                                             params)
    hstates = [ScannedRNN.initialize_carry(num_envs * n, gru_dim)
               for n in n_per_type]
    dones = [jnp.zeros((num_envs * n,), dtype=bool) for n in n_per_type]

    def step(carry, key):
        env_state, obsv, dones, hstates = carry
        key, akey, skey = jax.random.split(key, 3)
        actions = []
        new_h = list(hstates)
        for i, pol in enumerate(policies):
            # f32 at the network boundary (no-op for float obs; integer
            # message-window obs must not drive flax dtype promotion)
            obs_i = batchify(obsv[i], num_envs * n_per_type[i]
                             ).astype(jnp.float32)
            ac_in = (obs_i[None], dones[i][None])
            h, action, _ = pol.apply(None, hstates[i], ac_in, key=akey)
            new_h[i] = h
            a = unbatchify(action, num_envs, n_per_type[i])  # (E, A, K)
            # squeeze the agent/head axes only when they are singleton —
            # a bare .squeeze() would also collapse the env axis when
            # num_envs == 1 and crash the vmapped env.step
            if a.shape[-1] == 1:
                a = a.squeeze(-1)
            if n_per_type[i] == 1 and a.ndim > 1:
                a = a.squeeze(1)
            actions.append(a)
        step_keys = jax.random.split(skey, num_envs)
        obsv, env_state, rewards, done, info = jax.vmap(
            env.step, in_axes=(0, 0, 0, None))(step_keys, env_state, actions,
                                               params)
        new_dones = [batchify(done["agents"][i],
                              num_envs * n_per_type[i]).squeeze(-1)
                     for i in range(len(policies))]
        return (env_state, obsv, new_dones, new_h), (rewards, done, info,
                                                     actions)

    keys = jax.random.split(rng, num_steps)
    (env_state, obsv, dones, hstates), (rewards, done_seq, infos, actions) = \
        jax.lax.scan(step, (env_state, obsv, dones, hstates), keys)
    return rewards, done_seq, infos, actions


def evaluate_combinations(make_env_fn, policy_sets: Dict[str, List[Any]],
                          num_envs: int = 8, num_steps: int = 32,
                          seed: int = 0):
    """Evaluate every Learned/Baseline combination over agent types
    (reference: eval_policies, baseline_JAXMARL.py:819-943). `make_env_fn`
    maps a combo tuple like ('L', 'B') to a (env, policies) pair — a separate
    env per combo because baselines may use different action spaces."""
    results = {}
    n_types = len(next(iter(policy_sets.values())))
    for combo in itertools.product("LB", repeat=n_types):
        env, policies = make_env_fn(combo, policy_sets)
        rewards, done_seq, infos, _ = rollout(env, policies, num_envs,
                                           num_steps, seed=seed)
        results["".join(combo)] = {
            "mean_reward_per_type": [float(np.asarray(r).mean())
                                     for r in rewards],
        }
    return results
