"""Optimal-execution agent component.

Parity reference: gymnax_exchange/jaxen/exec_env.py (ExecutionAgent). Six
action spaces (fixed_quants, fixed_quants_complex, fixed_quants_1msg,
fixed_prices, simplest_case, scripted twap), VWAP advantage/drift reward with
fictional end-of-episode doom trade, rolling-mean state tracking, and
engineered/basic/simplest observation spaces.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.flatten_util
import jax.numpy as jnp

from ..config.constants import TradeCol
from ..config.structs import ExecConfig, WorldConfig
from ..lob import engine, queries
from . import spaces
from .mm import filter_messages
from .structs import ExecEnvParams, ExecEnvState, WorldState

I32 = jnp.int32
F32 = jnp.float32


class ExecutionAgent:
    def __init__(self, cfg: ExecConfig, world_config: WorldConfig):
        self.cfg = cfg
        self.world_config = world_config
        dispatch = {
            "fixed_quants": self._act_fixed_quants,
            "fixed_quants_complex": self._act_fixed_quants_complex,
            "fixed_prices": self._act_fixed_prices,
            "simplest_case": self._act_simplest,
            "fixed_quants_1msg": self._act_fixed_quants_1msg,
            "twap": self._act_twap,
        }
        if cfg.action_space not in dispatch:
            raise ValueError(f"Invalid action_space {cfg.action_space}")
        self.action_fn = dispatch[cfg.action_space]

    # ------------------------------------------------------------------ #

    def default_params(self, agent_config: ExecConfig, trader_id_range_start,
                       n_agents: int):
        """(reference: exec_env.py:188-201)"""
        nxt = trader_id_range_start - n_agents
        return ExecEnvParams(
            trader_id=jnp.arange(trader_id_range_start, nxt, -1),
            task_size=jnp.full((n_agents,), agent_config.task_size),
            reward_lambda=jnp.full((n_agents,), agent_config.reward_lambda),
            time_delay_obs_act=jnp.full((n_agents,),
                                        agent_config.time_delay_obs_act),
            normalize=jnp.full((n_agents,), agent_config.normalize),
        ), nxt

    def reset_env(self, agent_param: ExecEnvParams, key,
                  world_state: WorldState, num_msgs_per_step: int):
        """Randomises buy/sell per episode when task == 'random'
        (reference: exec_env.py:209-266)."""
        if self.cfg.task == "random":
            is_sell_task = jax.random.randint(key, minval=0, maxval=2,
                                              shape=())
        else:
            is_sell_task = jnp.asarray(
                0 if self.cfg.task == "buy" else 1, I32)
        state = ExecEnvState(
            init_price=world_state.mid_price,
            task_to_execute=self.cfg.task_size,
            quant_executed=0,
            is_sell_task=is_sell_task,
            p_vwap=world_state.mid_price / self.world_config.tick_size,
            total_revenue=0.0,
            drift_return=0.0,
            advantage_return=0.0,
            slippage_rm=0.0,
            price_adv_rm=0.0,
            price_drift_rm=0.0,
            vwap_rm=0.0,
            trade_duration=0.0)
        obs = self.get_observation(
            world_state=world_state, agent_state=state,
            agent_param=agent_param, total_messages=None,
            old_time=world_state.time, old_mid_price=world_state.mid_price,
            lob_state_before=None, normalize=self.cfg.normalize, flatten=True)
        return obs, state

    def is_terminal(self, world_state: WorldState,
                    agent_state: ExecEnvState):
        """Done when the task is filled (reference: exec_env.py:270-272)."""
        return agent_state.task_to_execute - agent_state.quant_executed <= 0

    # ------------------------------------------------------------------ #
    # action-space helpers
    # ------------------------------------------------------------------ #

    def _tick(self):
        return self.world_config.tick_size

    def _best(self, world_state):
        tick = self._tick()
        best_ask = jnp.int32((world_state.best_asks[-1][0] // tick) * tick)
        best_bid = jnp.int32((world_state.best_bids[-1][0] // tick) * tick)
        return best_ask, best_bid

    def _price_ladder(self, agent_state, best_ask, best_bid):
        """FT/M/NT/PP direction-dependent price levels
        (reference: exec_env.py:639-660)."""
        tick = self._tick()
        n_in = self.cfg.n_ticks_in_book

        def buy(best_ask, best_bid):
            FT = best_ask
            M = ((best_bid + best_ask) // 2 // tick) * tick
            NT = best_bid
            PP = best_bid - tick * n_in
            return FT, M, NT, PP

        def sell(best_ask, best_bid):
            FT = best_bid
            M = (jnp.ceil((best_bid + best_ask) / 2 // tick)
                 * tick).astype(I32)
            NT = best_ask
            PP = best_ask + tick * n_in
            return FT, M, NT, PP

        return jax.lax.cond(agent_state.is_sell_task, sell, buy,
                            best_ask, best_bid)

    def _assemble(self, world_state, agent_state, agent_params, quants,
                  prices, n_msgs):
        types = jnp.ones((n_msgs,), I32)
        sides = (1 - agent_state.is_sell_task * 2) * jnp.ones((n_msgs,), I32)
        trader_ids = jnp.ones((n_msgs,), I32) * agent_params.trader_id
        order_ids = jnp.full((n_msgs,),
                             self.world_config.placeholder_order_id, I32)
        times = jnp.resize(world_state.time + self.cfg.time_delay_obs_act,
                           (n_msgs, 2)).astype(I32)
        msgs = jnp.stack([types, sides, jnp.asarray(quants, I32).reshape(-1),
                          jnp.asarray(prices, I32).reshape(-1), order_ids,
                          trader_ids], axis=1)
        return jnp.concatenate([msgs, times], axis=1)

    def _cap_quants(self, agent_state, quants, quant_array_row1):
        """Never exceed the remaining task (reference: exec_env.py:697-703)."""
        quant_left = agent_state.task_to_execute - agent_state.quant_executed
        total = quants.sum()
        return jnp.where(total <= quant_left, quants,
                         jnp.floor(quant_array_row1 * quant_left)
                         ).astype(I32)

    # ------------------------------------------------------------------ #
    # action spaces
    # ------------------------------------------------------------------ #

    def _act_fixed_quants(self, action, world_state, agent_state,
                          agent_params):
        """5 actions -> one price level at fixed quantity, 4 messages
        (reference: exec_env.py:623-724)."""
        cfg = self.cfg
        best_ask, best_bid = self._best(world_state)
        price_levels = jnp.asarray(
            self._price_ladder(agent_state, best_ask, best_bid))
        quant_array = jnp.array([[0, 0, 0, 0], [1, 0, 0, 0], [0, 1, 0, 0],
                                 [0, 0, 1, 0], [0, 0, 0, 1]])
        if cfg.larger_far_touch_quant:
            quant_array = jnp.array([[0, 0, 0, 0], [10, 0, 0, 0],
                                     [0, 1, 0, 0], [0, 0, 1, 0],
                                     [0, 0, 0, 1]])
        quants = (quant_array[action, :] * cfg.fixed_quant_value).flatten()
        quants = self._cap_quants(agent_state, quants, quant_array[1])
        msgs = self._assemble(world_state, agent_state, agent_params, quants,
                              price_levels, cfg.num_action_messages_by_agent)
        return msgs, {}

    def _act_fixed_quants_complex(self, action, world_state, agent_state,
                                  agent_params):
        """13 actions = 4 levels x {1,2,5} x quant + none
        (reference: exec_env.py:838-932)."""
        cfg = self.cfg
        best_ask, best_bid = self._best(world_state)
        price_levels = jnp.asarray(
            self._price_ladder(agent_state, best_ask, best_bid))
        quant_array = jnp.array([
            [0, 0, 0, 0],
            [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1],
            [2, 0, 0, 0], [0, 2, 0, 0], [0, 0, 2, 0], [0, 0, 0, 2],
            [5, 0, 0, 0], [0, 5, 0, 0], [0, 0, 5, 0], [0, 0, 0, 5],
        ])
        quants = (quant_array[action, :] * cfg.fixed_quant_value).flatten()
        quants = self._cap_quants(agent_state, quants, quant_array[1])
        msgs = self._assemble(world_state, agent_state, agent_params, quants,
                              price_levels, cfg.num_action_messages_by_agent)
        return msgs, {}

    def _act_fixed_quants_1msg(self, action, world_state, agent_state,
                               agent_params):
        """Single-message variant (reference: exec_env.py:732-834)."""
        cfg = self.cfg
        best_ask, best_bid = self._best(world_state)
        pl = self._price_ladder(agent_state, best_ask, best_bid)
        prices_array = jnp.array([0, pl[0], pl[1], pl[2], pl[3]])
        price = prices_array[action]
        base = cfg.fixed_quant_value
        quant_array = jnp.array([0, base, base, base, base])
        quant = quant_array[action]
        quant_left = agent_state.task_to_execute - agent_state.quant_executed
        quant = jnp.where(quant <= quant_left, quant, 0).astype(I32)
        msgs = self._assemble(world_state, agent_state, agent_params,
                              jnp.array([quant]), jnp.array([price]), 1)
        return msgs, {}

    def _act_simplest(self, action, world_state, agent_state, agent_params):
        """3 actions: nothing / FT / NT (reference: exec_env.py:935-998)."""
        cfg = self.cfg
        best_ask, best_bid = self._best(world_state)

        def buy(a, b):
            return a, b    # FT = best_ask, NT = best_bid

        def sell(a, b):
            return b, a    # FT = best_bid, NT = best_ask

        price_levels = jnp.asarray(jax.lax.cond(
            agent_state.is_sell_task, sell, buy, best_ask, best_bid))
        quant_array = jnp.array([[0, 0],
                                 [cfg.fixed_quant_value, 0],
                                 [0, cfg.fixed_quant_value]])
        quants = quant_array[action, :]
        quants = self._cap_quants(agent_state, quants, quant_array[1])
        msgs = self._assemble(world_state, agent_state, agent_params, quants,
                              price_levels, cfg.num_action_messages_by_agent)
        return msgs, {}

    def _act_fixed_prices(self, action, world_state, agent_state,
                          agent_params):
        """Quantity per level, proportionally rescaled not to exceed the
        remaining task (reference: exec_env.py:1001-1123)."""
        cfg, tick = self.cfg, self._tick()
        action = jnp.atleast_1d(action)
        remaining = agent_state.task_to_execute - agent_state.quant_executed
        action = jax.lax.cond(
            jnp.sum(action) > remaining,
            lambda a: (a / jnp.sum(a) * remaining).astype(I32),
            lambda a: a.astype(I32),
            action)

        n_levels = action.shape[0]
        best_ask = jnp.int32(
            (world_state.best_asks[-10:].mean(axis=0)[0] // tick) * tick)
        best_bid = jnp.int32(
            (world_state.best_bids[-10:].mean(axis=0)[0] // tick) * tick)

        def buy(best_ask, best_bid):
            FT = ((best_ask) // tick * tick).astype(I32)
            M = ((best_bid + best_ask) // 2 // tick) * tick
            NT = best_bid
            PP = best_bid - tick * cfg.n_ticks_in_book
            MKT = self.world_config.maxint
            return {4: (FT, M, NT, PP, MKT), 3: (FT, NT, PP, MKT),
                    2: (FT, NT, MKT), 1: (FT, MKT)}[n_levels]

        def sell(best_ask, best_bid):
            FT = ((best_bid) // tick * tick).astype(I32)
            M = (jnp.ceil((best_bid + best_ask) / 2 // tick)
                 * tick).astype(I32)
            NT = best_ask
            PP = best_ask + tick * cfg.n_ticks_in_book
            MKT = 0
            return {4: (FT, M, NT, PP, MKT), 3: (FT, NT, PP, MKT),
                    2: (FT, NT, MKT), 1: (FT, MKT)}[n_levels]

        price_levels = jax.lax.cond(agent_state.is_sell_task, sell, buy,
                                    best_ask, best_bid)
        prices = jnp.asarray(price_levels)[:-1]
        quants = action.astype(I32)

        if cfg.n_actions == 4:
            def combine(q, p):
                q = q.at[2].set(q[2] + q[1]).at[1].set(0)
                p = p.at[1].set(-1)
                return q, p
            quants, prices = jax.lax.cond(
                jnp.asarray(price_levels)[1] == jnp.asarray(price_levels)[2],
                combine, lambda q, p: (q, p), quants, prices)

        msgs = self._assemble(world_state, agent_state, agent_params, quants,
                              prices, cfg.n_actions)
        return msgs, {}

    def _act_twap(self, action, world_state, agent_state, agent_params):
        """Scripted TWAP baseline: remaining/steps-left each step at FT or NT
        (reference: exec_env.py:1126-1225)."""
        cfg = self.cfg
        if self.world_config.ep_type != "fixed_steps":
            raise NotImplementedError(
                "TWAP requires fixed_steps episodes (as in the reference)")
        steps_left = world_state.max_steps_in_episode \
            - world_state.step_counter - 1
        quant_left = jnp.maximum(
            agent_state.task_to_execute - agent_state.quant_executed, 0)
        quant_this_step = jnp.ceil(quant_left / steps_left).astype(I32)

        best_ask, best_bid = self._best(world_state)

        def buy(a, b):
            return a, b

        def sell(a, b):
            return b, a

        price_levels = jnp.asarray(jax.lax.cond(
            agent_state.is_sell_task, sell, buy, best_ask, best_bid))
        quant_array = jnp.array([[1, 0], [0, 1]])
        quants = (quant_array[action, :] * quant_this_step).flatten()
        msgs = self._assemble(world_state, agent_state, agent_params, quants,
                              price_levels, cfg.num_action_messages_by_agent)
        return msgs, {}

    # ------------------------------------------------------------------ #
    # messages
    # ------------------------------------------------------------------ #

    def get_messages(self, action, world_state: WorldState,
                     agent_state: ExecEnvState, agent_params):
        """Cancels only the task side's standing orders, then nets
        (reference: exec_env.py:1229-1273)."""
        action_msgs, extras = self.action_fn(action, world_state, agent_state,
                                             agent_params)
        side_for_exe = 1 - agent_state.is_sell_task * 2
        raw_side = jax.lax.cond(
            agent_state.is_sell_task,
            lambda: world_state.ask_raw_orders,
            lambda: world_state.bid_raw_orders)
        cancel_msgs = engine.get_cancel_msgs(
            raw_side, agent_params.trader_id,
            self.cfg.num_messages_by_agent // 2, side_for_exe,
            world_state.time[0], world_state.time[1])
        action_msgs, cancel_msgs = filter_messages(action_msgs, cancel_msgs)
        return action_msgs, cancel_msgs, extras

    # ------------------------------------------------------------------ #
    # reward
    # ------------------------------------------------------------------ #

    def get_reward(self, world_state: WorldState, agent_state: ExecEnvState,
                   agent_params, trades, bestasks, bestbids, ep_done_time):
        """VWAP advantage + lambda * drift, with a fictional doom trade at a
        penalised reference price for unfilled quantity at episode end
        (reference: exec_env.py:1511-1758)."""
        cfg, wc, tick = self.cfg, self.world_config, self._tick()

        agent_before, _ = queries.get_agent_trades(trades,
                                                   agent_params.trader_id)
        quant_this_step = jnp.abs(
            agent_before[:, TradeCol.QUANT].sum())
        quant_left = agent_state.task_to_execute \
            - (agent_state.quant_executed + quant_this_step)

        penalty = cfg.doom_price_penalty * tick
        averageMidprice = ((bestbids[:, 0] + bestasks[:, 0]) / 2).mean()
        side_sign = agent_state.is_sell_task * 2 - 1

        if cfg.reference_price == "mid":
            reference_price = jax.lax.cond(
                agent_state.is_sell_task,
                lambda: ((averageMidprice - penalty) // tick
                         * tick).astype(I32),
                lambda: ((averageMidprice + penalty) // tick
                         * tick).astype(I32))
        elif cfg.reference_price == "far_touch":
            reference_price = jax.lax.cond(
                agent_state.is_sell_task,
                lambda: ((bestbids[-1, 0] - penalty) // tick
                         * tick).astype(I32),
                lambda: ((bestasks[-1, 0] + penalty) // tick
                         * tick).astype(I32))
        else:
            raise ValueError("Invalid reference price type.")

        def add_fictional(tr, price, quant):
            t = engine.create_trade(
                price, quant, wc.artificial_order_id_end_episode,
                wc.placeholder_order_id, 0, 0,
                wc.artificial_trader_id_end_episode, agent_params.trader_id)
            return engine.add_trade(tr, t)

        trades = jax.lax.cond(
            ep_done_time & (quant_left > 0),
            add_fictional, lambda tr, p, q: tr,
            trades, reference_price, side_sign * jnp.abs(quant_left))
        doom_quant = ep_done_time * quant_left

        agentTrades, otherTrades = queries.get_agent_trades(
            trades, agent_params.trader_id)
        agentQuant = jnp.abs(agentTrades[:, TradeCol.QUANT]).sum()
        otherQuant = jnp.abs(otherTrades[:, TradeCol.QUANT]).sum()

        P_vwap = jax.lax.cond(
            otherQuant == 0,
            lambda: (averageMidprice // tick).astype(F32),
            lambda: ((otherTrades[:, TradeCol.PRICE] // tick)
                     * (jnp.abs(otherTrades[:, TradeCol.QUANT])
                        / otherQuant)).sum().astype(F32))

        direction_switch = jnp.sign(agent_state.is_sell_task * 2 - 1)
        QP_agent = (agentTrades[:, TradeCol.PRICE] // tick
                    * jnp.abs(agentTrades[:, TradeCol.QUANT])).sum()

        advantage = direction_switch * (QP_agent - P_vwap * agentQuant)
        drift = direction_switch * agentQuant \
            * (P_vwap - agent_state.init_price // tick)
        price_advantage = advantage / (agentQuant + 1e-9)
        price_drift = drift / (agentQuant + 1e-9)
        slippage = advantage + drift

        step = world_state.step_counter
        vwap_rm = self._rolling_mean(agent_state.vwap_rm, P_vwap, step)
        price_adv_rm = self._rolling_mean(agent_state.price_adv_rm,
                                          price_advantage, step)
        slippage_rm = self._rolling_mean(agent_state.slippage_rm, slippage,
                                         step)
        price_drift_rm = self._rolling_mean(agent_state.price_drift_rm,
                                            price_drift, step)

        reward = advantage + cfg.reward_lambda * drift

        trade_duration_step = (jnp.abs(agentTrades[:, TradeCol.QUANT])
                               / agent_state.task_to_execute
                               * (agentTrades[:, TradeCol.TIME_S]
                                  - world_state.init_time[0])).sum()
        trade_duration = agent_state.trade_duration + trade_duration_step
        quant_left_out = agent_state.task_to_execute \
            - agent_state.quant_executed - agentQuant

        reward_scaled = reward / cfg.reward_scaling_quo
        if cfg.reward_function == "finish_fast":
            reward = -jnp.abs(quant_left_out).astype(F32)
            reward_scaled = reward / cfg.reward_scaling_quo
        elif cfg.reward_function == "simplest_case":
            entry_price = agent_state.init_price
            price_slip = agentTrades[:, TradeCol.PRICE] \
                - jnp.ones_like(agentTrades[:, 0]) * entry_price
            price_slip = jnp.where(agent_state.is_sell_task, price_slip,
                                   -price_slip)
            reward = jnp.dot(
                price_slip.astype(F32),
                jnp.abs(agentTrades[:, TradeCol.QUANT]).astype(F32))
            reward_scaled = reward / cfg.reward_scaling_quo

        extras = {
            "reward": reward,
            "agentQuant": agentQuant,
            "qp_agent": QP_agent,
            "slippage_rm": slippage_rm,
            "price_adv_rm": price_adv_rm,
            "price_drift_rm": price_drift_rm,
            "p_vwap": P_vwap,
            "vwap_rm": vwap_rm,
            "advantage": advantage,
            "drift": drift,
            "slippage": slippage,
            "doom_quant": doom_quant,
            "quant_left": quant_left_out,
            "trade_duration": trade_duration,
        }
        return reward_scaled, extras

    @staticmethod
    def _rolling_mean(old_mean, new_value, step_counter):
        """(reference: exec_env.py:1760-1762)"""
        return (old_mean * step_counter + new_value) / (step_counter + 1)

    # ------------------------------------------------------------------ #
    # state / info / obs
    # ------------------------------------------------------------------ #

    def update_state_and_get_done_and_info(self, world_state: WorldState,
                                           agent_state_old: ExecEnvState,
                                           extras):
        """(reference: exec_env.py:1771-1839)"""
        agent_state = agent_state_old.replace(
            quant_executed=agent_state_old.quant_executed
            + extras["agentQuant"],
            p_vwap=extras["p_vwap"],
            total_revenue=agent_state_old.total_revenue + extras["qp_agent"],
            drift_return=agent_state_old.drift_return + extras["drift"],
            advantage_return=agent_state_old.advantage_return
            + extras["advantage"],
            slippage_rm=extras["slippage_rm"],
            price_adv_rm=extras["price_adv_rm"],
            price_drift_rm=extras["price_drift_rm"],
            vwap_rm=extras["vwap_rm"],
            trade_duration=extras["trade_duration"])
        done = self.is_terminal(world_state, agent_state)
        info = {
            "quant_left": extras["quant_left"],
            "done": done,
            "revenue_direction_normalised": extras["slippage"],
            "vwap_rm": agent_state.vwap_rm,
            "drift": extras["drift"],
            "advantage": extras["advantage"],
            "doom_quant": extras["doom_quant"],
            "is_sell_task": agent_state.is_sell_task,
            "reward": extras["reward"],
        }
        return agent_state, done, info

    def get_observation(self, world_state, agent_state, agent_param,
                        total_messages, old_time, old_mid_price,
                        lob_state_before, normalize, flatten):
        """(reference: exec_env.py:1313-1333)"""
        if self.cfg.observation_space == "engineered":
            return self._obs_engineered(world_state, agent_state, normalize,
                                        flatten)
        elif self.cfg.observation_space == "basic":
            return self._obs_basic(world_state, agent_state, normalize,
                                   flatten)
        elif self.cfg.observation_space == "simplest_case":
            return self._obs_simplest(world_state, agent_state, normalize,
                                      flatten)
        raise ValueError(
            f"Invalid observation_space {self.cfg.observation_space}")

    @staticmethod
    def _normalize_obs(obs, means, stds):
        return jax.tree.map(lambda x, m, s: (x - m) / s, obs, means, stds)

    def _obs_simplest(self, world_state, agent_state, normalize,
                      flatten=True):
        """(reference: exec_env.py:1841-1875)"""
        wc = self.world_config
        time_used = world_state.time - world_state.init_time
        obs = {
            "percent_time_remaining":
                (wc.episode_time - (time_used[0] + time_used[1] / 1e9))
                / wc.episode_time,
            "percent_remaining_quant":
                (agent_state.task_to_execute - agent_state.quant_executed)
                / agent_state.task_to_execute,
            "mid_price": world_state.mid_price,
        }
        means = {"percent_time_remaining": 0.5,
                 "percent_remaining_quant": 0.5, "mid_price": 7560000}
        stds = {"percent_time_remaining": 1, "percent_remaining_quant": 1,
                "mid_price": 1e3}
        if normalize:
            obs = self._normalize_obs(obs, means, stds)
        if flatten:
            obs, _ = jax.flatten_util.ravel_pytree(obs)
        return obs

    def _obs_basic(self, world_state, agent_state, normalize, flatten=True):
        """(reference: exec_env.py:1879-1906)"""
        obs = {
            "best_ask_price": world_state.best_asks[-1][0],
            "best_bid_price": world_state.best_bids[-1][0],
            "remaining_quant": agent_state.task_to_execute
            - agent_state.quant_executed,
        }
        means = {"best_ask_price": 1550000, "best_bid_price": 1550000,
                 "remaining_quant": 0}
        stds = {"best_ask_price": 1e3, "best_bid_price": 1e3,
                "remaining_quant": self.cfg.task_size}
        if normalize:
            obs = self._normalize_obs(obs, means, stds)
        if flatten:
            obs, _ = jax.flatten_util.ravel_pytree(obs)
        return obs

    def _obs_engineered(self, world_state, agent_state, normalize,
                        flatten=True):
        """15 features in fixed_time mode, 12 in fixed_steps
        (reference: exec_env.py:1913-2079)."""
        wc = self.world_config
        quote_aggr, quote_pass = jax.lax.cond(
            agent_state.is_sell_task,
            lambda: (world_state.best_bids[-1], world_state.best_asks[-1]),
            lambda: (world_state.best_asks[-1], world_state.best_bids[-1]))
        bid_vol = queries.get_volume(world_state.bid_raw_orders)
        ask_vol = queries.get_volume(world_state.ask_raw_orders)
        vol_aggr, vol_pass = jax.lax.cond(
            agent_state.is_sell_task,
            lambda: (bid_vol, ask_vol),
            lambda: (ask_vol, bid_vol))
        obs = {
            "is_sell_task": agent_state.is_sell_task,
            "p_aggr": quote_aggr[0],
            "p_pass": quote_pass[0],
            "spread": jnp.abs(quote_aggr[0] - quote_pass[0]),
            "q_aggr": vol_aggr,
            "q_pass": vol_pass,
            "init_price": agent_state.init_price,
            "task_size": agent_state.task_to_execute,
            "executed_quant": agent_state.quant_executed,
            "remaining_quant": agent_state.task_to_execute
            - agent_state.quant_executed,
            "step_counter": world_state.step_counter,
            "remaining_ratio": jnp.where(
                world_state.max_steps_in_episode == 0, 0.,
                1. - world_state.step_counter
                / world_state.max_steps_in_episode),
        }
        means = {
            "is_sell_task": 0,
            "p_aggr": agent_state.init_price,
            "p_pass": agent_state.init_price,
            "spread": 0, "q_aggr": 0, "q_pass": 0, "init_price": 0,
            "task_size": 0, "executed_quant": 0, "remaining_quant": 0,
            "step_counter": 0, "remaining_ratio": 0,
        }
        stds = {
            "is_sell_task": 1, "p_aggr": 1e5, "p_pass": 1e5, "spread": 1e4,
            "q_aggr": 1000, "q_pass": 1000, "init_price": 1e7,
            "task_size": self.cfg.task_size,
            "executed_quant": self.cfg.task_size,
            "remaining_quant": self.cfg.task_size,
            "step_counter": 30, "remaining_ratio": 1,
        }
        if wc.ep_type == "fixed_time":
            time = world_state.time[0] + world_state.time[1] / 1e9
            time_elapsed = time - (world_state.init_time[0]
                                   + world_state.init_time[1] / 1e9)
            obs["time"] = time
            obs["delta_time"] = world_state.delta_time
            obs["time_remaining"] = wc.episode_time - time_elapsed
            means.update(time=0, delta_time=0, time_remaining=0)
            stds.update(time=1e5, delta_time=10,
                        time_remaining=wc.episode_time)
        if normalize:
            obs = self._normalize_obs(obs, means, stds)
        if flatten:
            obs, _ = jax.flatten_util.ravel_pytree(obs)
        return obs

    # ------------------------------------------------------------------ #

    def action_space(self):
        """(reference: exec_env.py — fixed_prices is a Box, rest Discrete)"""
        if self.cfg.action_space == "fixed_prices":
            return spaces.Box(0, 100, (self.cfg.n_actions,), dtype=I32)
        return spaces.Discrete(self.cfg.n_actions)

    def observation_space(self, num_msgs_per_step: int | None = None):
        cfg, wc = self.cfg, self.world_config
        if cfg.observation_space == "engineered":
            n = 15 if wc.ep_type == "fixed_time" else 12
            return spaces.Box(-1000, 1000, (n,), dtype=F32)
        elif cfg.observation_space == "basic":
            return spaces.Box(-1000, 1000, (3,), dtype=F32)
        elif cfg.observation_space == "simplest_case":
            return spaces.Box(-1000, 1000, (3,), dtype=F32)
        raise ValueError(f"Invalid observation_space {cfg.observation_space}")
