"""Multi-agent orchestrator environment.

Parity reference: gymnax_exchange/jaxen/marl_env.py (MARLEnv). Owns the world
env plus one agent component per *type*; agent instances of a type are
vmapped. The step pipeline (labels follow the reference's (A)-(K)):

  (B) slice data messages   (C) per-type vmapped get_messages + id assignment
      + optional shuffle    (D) one engine scan over [cancels; actions; data]
  (E) per-type vmapped rewards (fictional unwind inside)   (F) world update
  (G) per-type state/done/info   (I) dones   (J) info   (K) observations

Everything per-env is a single jittable pure function; batch parallelism is
vmap over envs (sharded over the device mesh by the training layer).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import chex
import jax
import jax.numpy as jnp
from jax import vmap

from ..config.structs import ExecConfig, MMConfig, MultiAgentConfig
from ..lob import engine, engine_sorted, queries
from .execution import ExecutionAgent
from .mm import MarketMakingAgent
from .structs import (MultiAgentParams, MultiAgentState, WorldState)
from .world import WorldEnv

I32 = jnp.int32

AGENT_CLASSES = {MMConfig: MarketMakingAgent, ExecConfig: ExecutionAgent}


class MarlEnv:
    """(reference: MARLEnv, marl_env.py:45-829)"""

    def __init__(self, key, multi_agent_config: MultiAgentConfig):
        self.config = multi_agent_config
        self.world_config = multi_agent_config.world_config
        self.num_agents = sum(multi_agent_config.number_of_agents_per_type)
        self.base_env = WorldEnv(self.world_config, key)

        self.type_names: List[str] = []
        self.instance_list = []
        self.agent_configs = []
        for name, agent_cfg in multi_agent_config.agents:
            self.agent_configs.append(agent_cfg)
            self.type_names.append(agent_cfg.short_name)
            cls = AGENT_CLASSES.get(type(agent_cfg))
            if cls is None:
                raise ValueError(f"Unknown agent config type {type(agent_cfg)}")
            self.instance_list.append(cls(agent_cfg, self.world_config))

        n_msg = self.world_config.n_data_msg_per_step
        n_action_msg = 0
        for cfg, n_agents in zip(self.agent_configs,
                                 multi_agent_config.number_of_agents_per_type):
            n_msg += cfg.num_messages_by_agent * n_agents
            n_action_msg += cfg.num_action_messages_by_agent * n_agents
        self.num_msgs_per_step = int(n_msg)
        self.num_action_msgs_per_step = int(n_action_msg)

        self.action_spaces = [i.action_space() for i in self.instance_list]
        # message-window obs spaces see ALL types' step messages, so their
        # row count is the orchestrator-level num_msgs_per_step (equal to the
        # per-type count only in single-type single-instance configs)
        self.observation_spaces = [
            i.observation_space(num_msgs_per_step=self.num_msgs_per_step)
            for i in self.instance_list]

    # ------------------------------------------------------------------ #

    @property
    def default_params(self) -> MultiAgentParams:
        """Disjoint negative trader-id ranges per type
        (reference: marl_env.py:96-127)."""
        base = self.base_env.default_params
        params_list = []
        next_start = self.world_config.trader_id_range_start
        for inst, cfg, n_agents in zip(
                self.instance_list, self.agent_configs,
                self.config.number_of_agents_per_type):
            p, next_start = inst.default_params(cfg, next_start, n_agents)
            params_list.append(p)
        return MultiAgentParams(loaded_params=base, agent_params=params_list)

    # ------------------------------------------------------------------ #

    @partial(jax.jit, static_argnums=(0,))
    def reset_env(self, key: chex.PRNGKey, params: MultiAgentParams
                  ) -> Tuple[List[jnp.ndarray], MultiAgentState]:
        """(reference: marl_env.py:129-207)"""
        n_types = len(self.instance_list)
        keys = jax.random.split(key, n_types + 1)
        agent_keys, world_key = keys[:-1], keys[-1]

        _, load_state = self.base_env.reset_env(world_key,
                                                params.loaded_params)
        best_ask, best_bid = queries.best_bid_ask_incl_quants(
            self.world_config, load_state.ask_raw_orders,
            load_state.bid_raw_orders)
        bestbids = jnp.tile(best_bid[None, :], (self.num_msgs_per_step, 1))
        bestasks = jnp.tile(best_ask[None, :], (self.num_msgs_per_step, 1))
        mid_price = jnp.float32((best_bid[0] + best_ask[0]) / 2)

        world_state = WorldState(
            **dataclasses.asdict(load_state),
            best_bids=bestbids,
            best_asks=bestasks,
            time=load_state.init_time,
            order_id_counter=jnp.asarray(
                self.world_config.order_id_counter_start_when_resetting, I32),
            mid_price=mid_price,
            delta_time=0.0)

        obs_list, state_list = [], []
        for inst, p, k in zip(self.instance_list, params.agent_params,
                              agent_keys):
            reset_vm = vmap(inst.reset_env, in_axes=(0, None, None, None),
                            out_axes=(0, 0))
            obs, st = reset_vm(p, k, world_state, self.num_msgs_per_step)
            obs_list.append(obs)
            state_list.append(st)

        return obs_list, MultiAgentState(world_state=world_state,
                                         agent_states=state_list)

    # ------------------------------------------------------------------ #

    @partial(jax.jit, static_argnums=(0,))
    def step_env(self, key: chex.PRNGKey, state: MultiAgentState,
                 actions: List[jnp.ndarray], params: MultiAgentParams):
        """(reference: marl_env.py:211-709)"""
        wc = self.world_config
        ws = state.world_state

        # (A) optional pre-step L2 snapshot for message-based obs / debug
        if wc.any_message_obs_space or wc.debug_mode:
            lob_state_before = queries.get_L2_state(
                ws.ask_raw_orders, ws.bid_raw_orders, 10, wc)
        else:
            lob_state_before = None

        # (B) data messages
        data_messages = self.base_env.get_data_messages(
            params.loaded_params.message_data, ws.start_index,
            ws.step_counter, ws.init_time[0] + wc.episode_time)

        # (C) per-type action/cancel messages
        action_msgs_list, cancel_msgs_list, act_extras_list = [], [], []
        for i, inst in enumerate(self.instance_list):
            agent_actions = actions[i]
            if self.config.number_of_agents_per_type[i] == 1:
                agent_actions = jnp.expand_dims(agent_actions, axis=0)
            gm = vmap(inst.get_messages, in_axes=(0, None, 0, 0),
                      out_axes=(0, 0, 0))
            a_msgs, c_msgs, extras = gm(agent_actions, ws,
                                        state.agent_states[i],
                                        params.agent_params[i])
            action_msgs_list.append(a_msgs)
            cancel_msgs_list.append(c_msgs)
            act_extras_list.append(extras)

        all_action_msgs = jnp.vstack(
            [x.reshape(-1, x.shape[-1]) for x in action_msgs_list])
        all_cancel_msgs = jnp.vstack(
            [x.reshape(-1, x.shape[-1]) for x in cancel_msgs_list])

        # overwrite order ids from the downward counter
        # (reference: marl_env.py:284-290)
        new_order_ids = jnp.arange(0, -self.num_action_msgs_per_step, -1) \
            + jnp.full((self.num_action_msgs_per_step,),
                       ws.order_id_counter)
        all_action_msgs = all_action_msgs.at[:, 4].set(new_order_ids)
        new_order_id_counter = ws.order_id_counter \
            - self.num_action_msgs_per_step

        if wc.shuffle_action_messages:
            key, shuffle_key = jax.random.split(key)
            if wc.shuffle_via_sort:
                # Uniform shuffle via sorting random keys: jax.random.
                # permutation lowers to a sequential swap loop of dynamic
                # updates on TPU; a 9-operand lax.sort of the 12-ish rows is
                # branchless and ~4ms/step cheaper at 2048 envs.
                rand = jax.random.bits(shuffle_key,
                                       (all_action_msgs.shape[0],))
                sorted_ops = jax.lax.sort(
                    (rand, *(all_action_msgs[:, i]
                             for i in range(all_action_msgs.shape[1]))),
                    num_keys=1)
                all_action_msgs = jnp.stack(sorted_ops[1:], axis=1)
            else:
                # reference-exact permutation (marl_env.py:293-295)
                all_action_msgs = jax.random.permutation(
                    shuffle_key, all_action_msgs, axis=0)

        combined_msgs = jnp.concatenate(
            [all_cancel_msgs, all_action_msgs, data_messages], axis=0)

        # (D) one engine scan over the combined stream; the third output is
        # the runtime exactness certificate (engine._overflow_flag): True iff
        # some message filled more orders than trade_capture_cap this step,
        # i.e. iff the capped trade buffer may deviate from fully-exact
        # capture (cannot fire at the default cap = nTrades)
        trades_reinit = engine.init_trades(wc.nTrades)
        scan_bidask_cert = engine_sorted.get_cert_scan_fn(wc)
        ((new_asks, new_bids, new_trades), (new_bestasks, new_bestbids),
         trade_overflow) = scan_bidask_cert(
                wc, key, combined_msgs,
                (ws.ask_raw_orders, ws.bid_raw_orders, trades_reinit),
                self.num_msgs_per_step)

        abort_episode = jnp.where(
            jnp.any(new_bestasks[:, 0] == -1)
            | jnp.any(new_bestbids[:, 0] == -1), True, False)
        new_bestasks = self._ffill_best_prices(new_bestasks,
                                               ws.best_asks[-1, 0])
        new_bestbids = self._ffill_best_prices(new_bestbids,
                                               ws.best_bids[-1, 0])

        final_time = combined_msgs[-1, -2:]
        ep_done_time = self._episode_done_time(final_time, ws)

        # (E) per-type rewards
        reward_list, rew_extras_list = [], []
        for i, inst in enumerate(self.instance_list):
            gr = vmap(inst.get_reward, in_axes=(None, 0, 0, None, None,
                                                None, None),
                      out_axes=(0, 0))
            reward, extras = gr(ws, state.agent_states[i],
                                params.agent_params[i], new_trades,
                                new_bestasks, new_bestbids, ep_done_time)
            reward_list.append(reward)
            rew_extras_list.append(extras)

        # (F) world state update
        old_time = ws.time
        old_mid_price = ws.mid_price
        new_step_counter = ws.step_counter + 1
        new_mid_price = (new_bestbids[-1, 0] + new_bestasks[-1, 0]) / 2
        new_delta_time = final_time[0] + final_time[1] / 1e9 \
            - ws.time[0] - ws.time[1] / 1e9

        new_world_state = ws.replace(
            ask_raw_orders=new_asks, bid_raw_orders=new_bids,
            trades=new_trades, best_asks=new_bestasks,
            best_bids=new_bestbids, time=final_time,
            order_id_counter=new_order_id_counter,
            step_counter=new_step_counter, mid_price=new_mid_price,
            delta_time=new_delta_time)

        # (G) per-type agent-state updates
        states_list, dones_list, infos_list = [], [], []
        for i, inst in enumerate(self.instance_list):
            extras = {**rew_extras_list[i], **act_extras_list[i]}
            us = vmap(inst.update_state_and_get_done_and_info,
                      in_axes=(None, 0, 0), out_axes=(0, 0, 0))
            st, dn, nf = us(new_world_state, state.agent_states[i], extras)
            states_list.append(st)
            dones_list.append(dn)
            infos_list.append(nf)

        # (H) combined state
        new_state = MultiAgentState(world_state=new_world_state,
                                    agent_states=states_list)

        # (I) dones
        overall_done = ep_done_time
        dones = {"__all__": overall_done, "agents": dones_list}

        # (J) info
        world_info = {
            "window_index": new_world_state.window_index,
            "end_mid_price": new_world_state.mid_price,
            "step_counter": new_world_state.step_counter,
            "time": new_world_state.time,
            "order_id_counter": new_world_state.order_id_counter,
            "best_asks": new_world_state.best_asks[-1, 0],
            "best_bids": new_world_state.best_bids[-1, 0],
            "average_best_ask": new_world_state.best_asks[:, 0].mean(),
            "average_best_bid": new_world_state.best_bids[:, 0].mean(),
            "delta_time": new_world_state.delta_time,
            "current_step": new_world_state.step_counter,
            "ep_done_time": ep_done_time,
            "abort_episode": abort_episode,
            "spread": new_world_state.best_asks[-1, 0]
            - new_world_state.best_bids[-1, 0],
            # repo addition (not in the reference's info dict): per-step
            # trade-capture exactness certificate — False certifies the
            # step's trades are bit-identical to fully-exact capture even
            # under a finite trade_capture_cap
            "trade_overflow": trade_overflow,
        }
        if wc.validate_messages:
            # repo addition (SURVEY §5: the reference has no sanitizers):
            # flags the out-of-domain message corners documented in
            # engine_psort (negative quantity / price == -1 on an active
            # type) arriving at the env->engine boundary — e.g. from a
            # future agent-space bug. Branchless, carried like the overflow
            # certificate; the static flag keeps it zero-cost when off.
            from ..lob.engine_psort import domain_violations
            world_info["domain_violation"] = jnp.any(
                domain_violations(combined_msgs))
        if wc.debug_mode:
            world_info.update({
                "trades": new_trades,
                "total_msgs": combined_msgs,
                "lob_state": queries.get_L2_state(
                    new_world_state.ask_raw_orders,
                    new_world_state.bid_raw_orders, 10, wc),
            })
        info = {"world": world_info, "agents": infos_list}

        # (K) per-type observations; zero obs for done-but-env-alive agents
        obs_list = []
        for i, inst in enumerate(self.instance_list):
            go = vmap(inst.get_observation,
                      in_axes=(None, 0, 0, None, None, None, None, None,
                               None))
            obs = go(new_world_state, new_state.agent_states[i],
                     params.agent_params[i], combined_msgs, old_time,
                     old_mid_price, lob_state_before,
                     self.agent_configs[i].normalize, True)
            if wc.save_raw_observations:
                info["agents"][i]["obs_raw"] = go(
                    new_world_state, new_state.agent_states[i],
                    params.agent_params[i], combined_msgs, old_time,
                    old_mid_price, lob_state_before, False, False)
            mask = jnp.logical_and(dones_list[i],
                                   jnp.logical_not(dones["__all__"]))
            # rank-generic broadcast: message-window obs are rank-3
            # (agents, msgs, 8), engineered/basic are rank-2
            mask_b = mask.reshape(mask.shape + (1,) * (obs.ndim - mask.ndim))
            obs = jnp.where(mask_b, jnp.zeros_like(obs), obs)
            obs_list.append(obs)

        return obs_list, new_state, reward_list, dones, info

    # ------------------------------------------------------------------ #

    def _episode_done_time(self, time, state: WorldState):
        """(reference: marl_env.py:717-718)"""
        return (state.max_steps_in_episode - state.step_counter - 1) <= 1

    @staticmethod
    def _ffill_best_prices(prices_quants, last_valid_price):
        """Forward-fill -1 prices and zero their quantities
        (reference: marl_env.py:723-749). The reference forward-fills with a
        sequential lax.scan over the message axis; here it is a log-depth
        associative scan ("last valid value" is associative), which
        vectorises instead of serialising the 112-element chain."""
        def ffill(arr, inval=-1):
            def op(a, b):
                return jnp.where(b == inval, a, b)
            return jax.lax.associative_scan(op, arr)

        prices_quants = prices_quants.at[0, 0:2].set(
            jnp.where(prices_quants[0, 0] == -1,
                      jnp.array([last_valid_price, 0]),
                      prices_quants[0, 0:2]))
        prices_quants = prices_quants.at[:, 1].set(
            jnp.where(prices_quants[:, 0] == -1, 0, prices_quants[:, 1]))
        prices_quants = prices_quants.at[:, 0].set(ffill(prices_quants[:, 0]))
        return prices_quants

    # ------------------------------------------------------------------ #

    def action_space(self):
        return self.action_spaces

    def observation_space(self):
        return self.observation_spaces

    @partial(jax.jit, static_argnums=(0,))
    def reset(self, key: chex.PRNGKey, params: MultiAgentParams):
        if params is None:
            raise ValueError("Params must be provided to reset.")
        return self.reset_env(key, params)

    @partial(jax.jit, static_argnums=(0,))
    def step(self, key: chex.PRNGKey, state: MultiAgentState,
             actions: List[jnp.ndarray], params: MultiAgentParams,
             reset_state: Optional[MultiAgentState] = None):
        """Auto-resetting step: on episode end, tree-select the freshly reset
        state (reference: marl_env.py:775-804)."""
        key, key_reset = jax.random.split(key)
        obs_st, st_st, rewards, dones, infos = self.step_env(
            key, state, actions, params)
        if reset_state is None:
            obs_re, st_re = self.reset(key_reset, params)
        else:
            raise NotImplementedError(
                "explicit reset_state not supported (matches reference)")
        states = jax.tree.map(
            lambda x, y: jax.lax.select(dones["__all__"], x, y), st_re, st_st)
        obs = jax.tree.map(
            lambda x, y: jax.lax.select(dones["__all__"], x, y), obs_re,
            obs_st)
        return obs, states, rewards, dones, infos
