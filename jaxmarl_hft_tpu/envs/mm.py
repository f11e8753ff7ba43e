"""Market-making agent component.

Parity reference: gymnax_exchange/jaxen/mm_env.py (MarketMakingAgent). The
component interface consumed by the MARL orchestrator:

    default_params(cfg, trader_id_range_start, n_agents) -> (params, next_id)
    reset_env(params_i, key, world_state, num_msgs) -> (obs, state)
    get_messages(action, world, agent_state, params_i)
        -> (action_msgs, cancel_msgs, extras)
    get_reward(world, agent_state, params_i, trades, bestasks, bestbids,
               ep_done) -> (reward, extras)
    update_state_and_get_done_and_info(world, agent_state, extras)
        -> (state, done, info)
    get_observation(world, agent_state, params_i, ...) -> obs

Eight action spaces, ~10 reward functions, engineered/basic/messages
observation spaces — per SURVEY.md §2 L3.

Known deviation: the reference's MM ``fixed_prices`` action body references an
undefined variable (mm_env.py:1642 uses ``state``) and so cannot execute; here
it is implemented working, reading the world state's best prices.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.flatten_util
import jax.numpy as jnp

from ..config.structs import MMConfig, WorldConfig
from ..lob import engine, queries
from ..config.constants import OrderCol, TradeCol
from . import spaces
from .structs import MMEnvParams, MMEnvState, WorldState

I32 = jnp.int32
F32 = jnp.float32


def filter_messages(action_msgs: jax.Array, cnl_msgs: jax.Array
                    ) -> Tuple[jax.Array, jax.Array]:
    """Net new orders against same-price cancellations
    (reference: mm_env.py:520-582 _filter_messages — identical logic is
    duplicated in exec_env.py:413-475; factored out here).

    Only simplifies when the new action size <= the cancelled size; larger new
    orders still cancel the old order entirely to avoid split orders.

    The occurrence-rank pairing (k-th price-matched action row nets against
    the k-th price-matched cancel row) is built from one-hot compare/reduce
    matrices: the reference's compaction (`jnp.where(size=...)` + row
    gathers + argsort-rank scatter) lowers to serialised gathers on TPU that
    act as fusion barriers across the whole env step (see get_cancel_msgs).
    """
    prices_a, prices_c = action_msgs[:, 3], cnl_msgs[:, 3]
    res = (prices_c[None, :] == prices_a[:, None]) & (prices_a != 0)[:, None]
    a_mask, c_mask = jnp.any(res, axis=1), jnp.any(res, axis=0)

    n = a_mask.shape[0]                                 # pairing slots
    occ_a = (jnp.cumsum(a_mask) - 1)[None, :]
    occ_c = (jnp.cumsum(c_mask) - 1)[None, :]
    Wa = a_mask[None, :] & (occ_a == jax.lax.broadcasted_iota(
        I32, (n, a_mask.shape[0]), 0))                  # (k, action row)
    Wc = c_mask[None, :] & (occ_c == jax.lax.broadcasted_iota(
        I32, (n, c_mask.shape[0]), 0))                  # (k, cancel row)

    a = jnp.sum(jnp.where(Wa, action_msgs[:, 2][None, :], 0), axis=1)
    c = jnp.sum(jnp.where(Wc, cnl_msgs[:, 2][None, :], 0), axis=1)
    rel_cnl = (c >= a) * a                              # (k,)

    back_a = jnp.sum(jnp.where(Wa, rel_cnl[:, None], 0), axis=0)
    back_c = jnp.sum(jnp.where(Wc, rel_cnl[:, None], 0), axis=0)
    action_msgs = action_msgs.at[:, 2].set(action_msgs[:, 2] - back_a)
    action_msgs = jnp.where((action_msgs[:, 2] == 0)[:, None], 0,
                            action_msgs)
    cnl_msgs = cnl_msgs.at[:, 2].set(cnl_msgs[:, 2] - back_c)
    return action_msgs, cnl_msgs


def extract_agent_trade_stats(trades: jax.Array, trader_id):
    """Split the step's trades into agent/other and buy/sell/passive subsets
    (reference: mm_env.py:2214-2243)."""
    executed = jnp.where((trades[:, 0] >= 0)[:, None], trades, 0)
    mask = ((trader_id == executed[:, TradeCol.PASS_TID])
            | (trader_id == executed[:, TradeCol.AGR_TID]))
    agent = jnp.where(mask[:, None], executed, 0)
    other = jnp.where(mask[:, None], 0, executed)

    q = agent[:, TradeCol.QUANT]
    pass_t = trader_id == agent[:, TradeCol.PASS_TID]
    agr_t = trader_id == agent[:, TradeCol.AGR_TID]
    mask_buy = ((q >= 0) & pass_t) | ((q < 0) & agr_t)
    mask_sell = ((q < 0) & pass_t) | ((q >= 0) & agr_t)
    buys = jnp.where(mask_buy[:, None], agent, 0)
    sells = jnp.where(mask_sell[:, None], agent, 0)
    pass_buys = jnp.where(((q >= 0) & pass_t)[:, None], agent, 0)
    pass_sells = jnp.where(((q < 0) & pass_t)[:, None], agent, 0)
    return agent, other, buys, sells, pass_buys, pass_sells


class MarketMakingAgent:
    def __init__(self, cfg: MMConfig, world_config: WorldConfig):
        self.cfg = cfg
        self.world_config = world_config
        dispatch = {
            "fixed_quants": self._act_fixed_quants,
            "fixed_prices": self._act_fixed_prices,
            "AvSt": self._act_avst,
            "bobStrategy": self._act_bob_strategy,
            "bobRL": self._act_bob_rl,
            "spread_skew": self._act_spread_skew,
            "directional_trading": self._act_directional,
            "simple": self._act_simple,
        }
        if cfg.action_space not in dispatch:
            raise ValueError(f"Invalid action_space {cfg.action_space}")
        self.action_fn = dispatch[cfg.action_space]

    # ------------------------------------------------------------------ #
    # params / reset
    # ------------------------------------------------------------------ #

    def default_params(self, agent_config: MMConfig, trader_id_range_start,
                       n_agents: int):
        """(reference: mm_env.py:189-202)"""
        nxt = trader_id_range_start - n_agents
        return MMEnvParams(
            trader_id=jnp.arange(trader_id_range_start, nxt, -1),
            time_delay_obs_act=jnp.full((n_agents,),
                                        agent_config.time_delay_obs_act),
            normalize=jnp.full((n_agents,), agent_config.normalize),
        ), nxt

    def reset_env(self, agent_param: MMEnvParams, key, world_state: WorldState,
                  num_msgs_per_step: int):
        """(reference: mm_env.py:417-459)"""
        state = MMEnvState(posted_distance_bid=0, posted_distance_ask=0,
                           inventory=0, total_PnL=0.0, cash_balance=0.0)
        # message-window obs: the reset observation is a blank window sized
        # like the step observation — the FULL step message stream
        # (reference resets with None and a per-type size, which only
        # matches the step shape in single-type single-instance configs)
        blank_msgs = jnp.zeros((num_msgs_per_step, 8), dtype=I32)
        obs = self.get_observation(
            world_state=world_state, agent_state=state,
            agent_param=agent_param, total_messages=blank_msgs,
            old_time=world_state.time, old_mid_price=world_state.mid_price,
            lob_state_before=None, normalize=self.cfg.normalize, flatten=True)
        return obs, state

    def is_terminal(self, world_state: WorldState):
        """The market maker never stops making markets
        (reference: mm_env.py:463-483)."""
        return False

    # ------------------------------------------------------------------ #
    # shared action-space helpers
    # ------------------------------------------------------------------ #

    def _tick(self):
        return self.world_config.tick_size

    def _masked_best(self, world_state: WorldState, agent_params):
        """Best bid/ask excluding this agent's own orders, with empty-book
        fallback to the last known prices (reference: mm_env.py:977-995)."""
        wc = self.world_config
        ask_mask = world_state.ask_raw_orders[:, OrderCol.TID] \
            != agent_params.trader_id
        bid_mask = world_state.bid_raw_orders[:, OrderCol.TID] \
            != agent_params.trader_id
        masked_asks = jnp.where(ask_mask[:, None],
                                world_state.ask_raw_orders, -1)
        masked_bids = jnp.where(bid_mask[:, None],
                                world_state.bid_raw_orders, -1)
        best_ask, best_bid = queries.get_best_bid_and_ask(
            wc, masked_asks, masked_bids)
        empty_book = jnp.where((best_ask == -1) | (best_bid == -1),
                               True, False)
        best_ask = jnp.int32((best_ask // wc.tick_size) * wc.tick_size)
        best_bid = jnp.int32((best_bid // wc.tick_size) * wc.tick_size)
        best_bid = jnp.where(empty_book, world_state.best_bids[-1, 0],
                             best_bid)
        best_ask = jnp.where(empty_book, world_state.best_asks[-1, 0],
                             best_ask)
        return best_ask, best_bid, empty_book

    def _raw_best(self, world_state: WorldState):
        tick = self._tick()
        best_ask = jnp.int32((world_state.best_asks[-1][0] // tick) * tick)
        best_bid = jnp.int32((world_state.best_bids[-1][0] // tick) * tick)
        return best_ask, best_bid

    def _assemble(self, world_state, agent_params, types, sides, quants,
                  prices, n_msgs=None):
        """Stack message components into an (n, 8) action-message array."""
        n = n_msgs or self.cfg.num_action_messages_by_agent
        quants = jnp.asarray(quants, I32).reshape(-1)
        prices = jnp.asarray(prices, I32).reshape(-1)
        trader_ids = jnp.full((n,), agent_params.trader_id, dtype=I32)
        order_ids = jnp.full((n,), self.world_config.placeholder_order_id,
                             dtype=I32)
        times = jnp.resize(world_state.time + self.cfg.time_delay_obs_act,
                           (n, 2)).astype(I32)
        msgs = jnp.stack([jnp.asarray(types, I32), jnp.asarray(sides, I32),
                          quants, prices, order_ids, trader_ids], axis=1)
        return jnp.concatenate([msgs, times], axis=1)

    @staticmethod
    def _extras(bid_quant=0, ask_quant=0, empty_book=False, bid_dist=0,
                ask_dist=0, posted_bid=0, posted_ask=0):
        return {"bid_quant": bid_quant, "ask_quant": ask_quant,
                "empty_book": empty_book,
                "bid_distance_from_best": bid_dist,
                "ask_distance_from_best": ask_dist,
                "posted_bid_price": posted_bid,
                "posted_ask_price": posted_ask}

    # ------------------------------------------------------------------ #
    # action spaces
    # ------------------------------------------------------------------ #

    def _act_fixed_quants(self, action, world_state, agent_state,
                          agent_params):
        """10 discrete offset-from-best quotes incl. market-order liquidation
        as action 9 (reference: mm_env.py:970-1118)."""
        cfg, wc, tick = self.cfg, self.world_config, self._tick()
        if cfg.fixed_action_setting:
            action = jnp.asarray(cfg.fixed_action)
        best_ask, best_bid, empty_book = self._masked_best(world_state,
                                                           agent_params)
        if not cfg.sell_buy_all_option:
            bid_offsets = jnp.array([0, 1, 2, 3, 4, 0, 2, 5, 1, 0], F32)
            ask_offsets = jnp.array([0, 1, 2, 3, 4, 2, 0, 1, 5, 0], F32)
            bid_quants = jnp.array([1, 1, 1, 1, 1, 1, 1, 1, 1, 0], I32)
            ask_quants = jnp.array([1, 1, 1, 1, 1, 1, 1, 1, 1, 0], I32)
        else:
            inv = agent_state.inventory
            bid_offsets = jnp.array([10, 2, 4, -1, 0, 2, -20, 0, 0], F32)
            ask_offsets = jnp.array([10, 2, 4, -1, 2, 0, 0, -20, 0], F32)
            bid_quants = jnp.array([1, 1, 1, 1, 1, 1,
                                    inv // cfg.fixed_quant_value, 0, 0], I32)
            ask_quants = jnp.array([1, 1, 1, 1, 1, 1, 0,
                                    inv // cfg.fixed_quant_value, 0], I32)

        half_spread_prev = jnp.maximum((best_ask - best_bid) / 2, tick / 2)
        half_spread = (half_spread_prev // tick + 1) * tick

        bid_quant = bid_quants[action] * cfg.fixed_quant_value
        ask_quant = ask_quants[action] * cfg.fixed_quant_value
        bid_quant = jnp.where(empty_book, 0, bid_quant)
        ask_quant = jnp.where(empty_book, 0, ask_quant)

        bid_price = best_bid - bid_offsets[action] * half_spread
        ask_price = best_ask + ask_offsets[action] * half_spread
        bid_price = (jnp.maximum(bid_price, 0) // tick * tick).astype(I32)
        ask_price = (jnp.maximum(bid_price + tick, ask_price)
                     // tick * tick).astype(I32)

        types = jnp.asarray([1, 1], I32)
        sides = jnp.asarray([1, -1], I32)
        quants = jnp.asarray([bid_quant, ask_quant], I32)
        prices = jnp.asarray([bid_price, ask_price], I32)

        def liquidation(cond):
            liq_types = jnp.asarray([4, 4], I32)
            liq_sides = jnp.asarray([-1, 1], I32)
            liq_quants = jnp.asarray(
                [cfg.auto_liquidate_alpha
                 * jnp.maximum(-agent_state.inventory, 0),
                 cfg.auto_liquidate_alpha
                 * jnp.maximum(agent_state.inventory, 0)], I32)
            liq_prices = jnp.asarray([best_ask + half_spread * 10,
                                      best_bid - half_spread * 10], I32)
            return (jnp.where(cond, liq_types, types),
                    jnp.where(cond, liq_sides, sides),
                    jnp.where(cond, liq_quants, quants),
                    jnp.where(cond, liq_prices, prices))

        if cfg.tenth_action == "MarketOrder":
            types, sides, quants, prices = liquidation(action == 9)
        if cfg.auto_liquidate_threshold != 0:
            types, sides, quants, prices = liquidation(
                jnp.abs(agent_state.inventory) > cfg.auto_liquidate_threshold)

        msgs = self._assemble(world_state, agent_params, types, sides,
                              quants.reshape(-1), prices.reshape(-1))
        return msgs, self._extras(
            bid_quant=bid_quant, ask_quant=ask_quant, empty_book=empty_book,
            bid_dist=best_bid - bid_price, ask_dist=ask_price - best_ask,
            posted_bid=bid_price, posted_ask=ask_price)

    def _act_simple(self, action, world_state, agent_state, agent_params):
        """Quote/one-sided/nothing (reference: mm_env.py:1123-1243)."""
        cfg, tick = self.cfg, self._tick()
        best_ask, best_bid = self._raw_best(world_state)
        if cfg.fixed_action_setting:
            action = jnp.asarray(cfg.fixed_action)
        if not cfg.sell_buy_all_option:
            if cfg.simple_nothing_action:
                bid_offsets = jnp.array([0, -2000, 0, 0], F32)
                ask_offsets = jnp.array([0, 0, -2000, 0], F32)
                bid_quants = jnp.array([1, 1, 0, 0], I32)
                ask_quants = jnp.array([1, 0, 1, 0], I32)
            else:
                bid_offsets = jnp.array([0, -2000, 0], F32)
                ask_offsets = jnp.array([0, 0, -2000], F32)
                bid_quants = jnp.array([1, 1, 0], I32)
                ask_quants = jnp.array([1, 0, 1], I32)
            bid_quant = bid_quants[action] * cfg.fixed_quant_value
            ask_quant = ask_quants[action] * cfg.fixed_quant_value
        else:
            inv = agent_state.inventory
            q_all_ask, q_all_bid = jax.lax.cond(
                inv > 0,
                lambda i: (jnp.maximum(jnp.abs(i), cfg.fixed_quant_value),
                           cfg.fixed_quant_value),
                lambda i: (cfg.fixed_quant_value,
                           jnp.maximum(jnp.abs(i), cfg.fixed_quant_value)),
                inv)
            if cfg.simple_nothing_action:
                bid_offsets = jnp.array([0, -2000, 0, 0], F32)
                ask_offsets = jnp.array([0, 0, -2000, 0], F32)
                bid_quants = jnp.array([cfg.fixed_quant_value, q_all_bid,
                                        0, 0], I32)
                ask_quants = jnp.array([cfg.fixed_quant_value, 0,
                                        q_all_ask, 0], I32)
            else:
                bid_offsets = jnp.array([0, -2000, 0], F32)
                ask_offsets = jnp.array([0, 0, -2000], F32)
                bid_quants = jnp.array([cfg.fixed_quant_value, q_all_bid, 0],
                                       I32)
                ask_quants = jnp.array([cfg.fixed_quant_value, 0, q_all_ask],
                                       I32)
            bid_quant = bid_quants[action]
            ask_quant = ask_quants[action]

        tick_offset = cfg.n_ticks_offset * tick
        bid_price = best_bid - bid_offsets[action] * tick_offset
        ask_price = best_ask + ask_offsets[action] * tick_offset
        bid_price = (jnp.maximum(bid_price, 0) // tick * tick).astype(I32)
        ask_price = (ask_price // tick * tick).astype(I32)

        msgs = self._assemble(
            world_state, agent_params, [1, 1], [1, -1],
            jnp.asarray([bid_quant, ask_quant], I32),
            jnp.asarray([bid_price, ask_price], I32))
        return msgs, self._extras(bid_quant=bid_quant, ask_quant=ask_quant)

    def _act_avst(self, action, world_state, agent_state, agent_params):
        """Avellaneda-Stoikov reservation-price quoting with discrete risk
        aversion (reference: mm_env.py:1248-1398)."""
        cfg, wc, tick = self.cfg, self.world_config, self._tick()
        best_ask, best_bid, empty_book = self._masked_best(world_state,
                                                           agent_params)
        mid_price = (best_ask + best_bid) // 2
        gamma = jnp.array([0.1, 0.2, 0.5, 1, 2, 5, 10, 20], F32)[action]
        k = cfg.avst_k_parameter
        variance = cfg.avst_var_parameter
        if wc.ep_type == "fixed_time":
            time_left = wc.episode_time \
                - (world_state.time - world_state.init_time)[0]
        else:
            time_left = wc.episode_time - world_state.step_counter
        normalized_time = time_left / wc.episode_time

        res_price = mid_price - agent_state.inventory * gamma * variance \
            * normalized_time
        spread = gamma * variance * normalized_time \
            + (2 / gamma) * jnp.log(1 + gamma / k)
        spread = jnp.clip(spread, tick, wc.maxint)

        bid_price = jnp.clip(res_price - spread / 2, 0, wc.maxint)
        ask_price = jnp.clip(res_price + spread / 2, 0, wc.maxint)
        bid_price = (bid_price // tick * tick).astype(I32)
        ask_price = (ask_price // tick * tick).astype(I32)

        def round_down(x, m):
            return (x // m - jnp.where(x % m == 0, 1, 0)) * m

        def round_up(x, m):
            return (x // m + 1) * m

        bid_price = jnp.minimum(bid_price, round_down(mid_price, tick))
        ask_price = jnp.maximum(ask_price, round_up(mid_price, tick))

        q = cfg.fixed_quant_value
        msgs = self._assemble(world_state, agent_params, [1, 1], [1, -1],
                              jnp.asarray([q, q], I32),
                              jnp.asarray([bid_price, ask_price], I32))
        return msgs, self._extras(
            bid_quant=q, ask_quant=q, bid_dist=best_bid - bid_price,
            ask_dist=ask_price - best_ask, posted_bid=bid_price,
            posted_ask=ask_price)

    def _act_bob_strategy(self, action, world_state, agent_state,
                          agent_params):
        """Inventory-proportional quote sizes at the touch
        (reference: mm_env.py:1400-1471)."""
        cfg = self.cfg
        if cfg.fixed_action_setting:
            action = jnp.asarray(cfg.fixed_action)
        kappa = (action + 1) / (cfg.bob_v0 * 5)
        best_ask, best_bid, empty_book = self._masked_best(world_state,
                                                           agent_params)
        pos = agent_state.inventory
        v0 = cfg.bob_v0
        bid_quant = jnp.round(v0 * jnp.maximum(1 - kappa * pos, 0)).astype(I32)
        ask_quant = jnp.round(v0 * jnp.maximum(1 + kappa * pos, 0)).astype(I32)
        bid_quant = jnp.where(empty_book, 0, bid_quant)
        ask_quant = jnp.where(empty_book, 0, ask_quant)
        msgs = self._assemble(world_state, agent_params, [1, 1], [1, -1],
                              jnp.asarray([bid_quant, ask_quant], I32),
                              jnp.asarray([best_bid, best_ask], I32))
        return msgs, self._extras(bid_quant=bid_quant, ask_quant=ask_quant,
                                  empty_book=empty_book)

    def _act_bob_rl(self, action, world_state, agent_state, agent_params):
        """Discrete bid/ask size ladder at the touch
        (reference: mm_env.py:1474-1561)."""
        cfg = self.cfg
        if cfg.fixed_action_setting:
            action = jnp.asarray(cfg.fixed_action)
        best_ask, best_bid, empty_book = self._masked_best(world_state,
                                                           agent_params)
        ladders = {
            1: ([1, 2, 0], [1, 0, 2]),
            2: ([2, 3, 1, 4, 0], [2, 1, 3, 0, 4]),
            5: ([5, 6, 4, 7, 3, 8, 2, 9, 1, 10, 0],
                [5, 4, 6, 3, 7, 2, 8, 1, 9, 0, 10]),
            10: ([10, 11, 9, 12, 8, 13, 7, 14, 6, 15, 5, 16, 4, 17, 3, 18,
                  2, 19, 1, 20, 0],
                 [10, 9, 11, 8, 12, 7, 13, 6, 14, 5, 15, 4, 16, 3, 17, 2,
                  18, 1, 19, 0, 20]),
        }
        if cfg.bob_v0 not in ladders:
            raise ValueError("bob_v0 must be one of [1,2,5,10]")
        bq, aq = ladders[cfg.bob_v0]
        bid_quant = jnp.array(bq, I32)[action] * cfg.fixed_quant_value
        ask_quant = jnp.array(aq, I32)[action] * cfg.fixed_quant_value
        bid_quant = jnp.where(empty_book, 0, bid_quant)
        ask_quant = jnp.where(empty_book, 0, ask_quant)
        msgs = self._assemble(world_state, agent_params, [1, 1], [1, -1],
                              jnp.asarray([bid_quant, ask_quant], I32),
                              jnp.asarray([best_bid, best_ask], I32))
        return msgs, self._extras(bid_quant=bid_quant, ask_quant=ask_quant,
                                  empty_book=empty_book)

    def _act_fixed_prices(self, action, world_state, agent_state,
                          agent_params):
        """Quantity vector over derived price levels (n_actions levels per
        side) (reference: mm_env.py:1563-1665; implemented working — see
        module docstring)."""
        cfg, tick = self.cfg, self._tick()
        n = cfg.n_actions
        best_ask, best_bid = self._raw_best(world_state)

        half = jnp.asarray(action).shape[0] // 2

        def buy_levels():
            FT = ((best_ask) // tick * tick).astype(I32)
            M = (jnp.ceil((best_bid + best_ask) / 2 // tick) * tick
                 ).astype(I32)
            BI = best_bid + tick * cfg.n_ticks_offset
            NT = best_bid
            PP = best_bid - tick * cfg.n_ticks_offset
            return {4: (FT, M, NT, PP), 3: (BI, NT, PP), 2: (NT, PP),
                    1: (NT,)}[half]

        def sell_levels():
            FT = ((best_bid) // tick * tick).astype(I32)
            M = (jnp.ceil((best_bid + best_ask) / 2 // tick) * tick
                 ).astype(I32)
            AI = best_ask - tick * cfg.n_ticks_offset
            NT = best_ask
            PP = best_ask + tick * cfg.n_ticks_offset
            return {4: (FT, M, NT, PP), 3: (AI, NT, PP), 2: (NT, PP),
                    1: (NT,)}[half]

        price_levels = jnp.concatenate([jnp.asarray(buy_levels()),
                                        jnp.asarray(sell_levels())])
        types = jnp.ones((n,), I32)
        sides = jnp.concatenate([jnp.ones((n // 2,), I32),
                                 -jnp.ones((n - n // 2,), I32)])
        quants = jnp.asarray(action, I32)
        msgs = self._assemble(world_state, agent_params, types, sides,
                              quants, price_levels, n_msgs=n)
        return msgs, self._extras()

    def _act_spread_skew(self, action, world_state, agent_state,
                         agent_params):
        """6 actions = 2 spreads x 3 skews (reference: mm_env.py:1667-1806)."""
        cfg, tick = self.cfg, self._tick()
        best_ask, best_bid = self._raw_best(world_state)
        mid_price = (best_ask + best_bid) / 2
        current_spread = best_ask - best_bid
        spread_type = action // 3
        skew_type = action % 3
        spread_mult = jnp.where(spread_type == 0, 1.0, cfg.spread_multiplier)
        new_spread = current_spread * spread_mult
        skew_ticks = jnp.where(
            skew_type == 0, -cfg.skew_multiplier,
            jnp.where(skew_type == 1, 0, cfg.skew_multiplier))
        if cfg.multiplier_type == "spread":
            skewed_mid = mid_price + skew_ticks * new_spread
        else:
            skewed_mid = mid_price + skew_ticks * tick
        half_spread = new_spread // 2
        bid_price = ((skewed_mid - half_spread) // tick * tick).astype(I32)
        ask_price = ((skewed_mid + half_spread) // tick * tick).astype(I32)
        q = cfg.fixed_quant_value
        msgs = self._assemble(world_state, agent_params, [1, 1], [1, -1],
                              jnp.asarray([q, q], I32),
                              jnp.asarray([bid_price, ask_price],
                                          I32).reshape(-1))
        return msgs, self._extras(bid_quant=q, ask_quant=q)

    def _act_directional(self, action, world_state, agent_state,
                         agent_params):
        """0 nothing / 1 buy at ask / 2 sell at bid
        (reference: mm_env.py:1810-1865)."""
        cfg, tick = self.cfg, self._tick()
        best_ask, best_bid = self._raw_best(world_state)
        quant = cfg.fixed_quant_value
        bid_active = jnp.array([0, 1, 0], I32)[action]
        ask_active = jnp.array([0, 0, 1], I32)[action]
        bid_quant = bid_active * quant
        ask_quant = ask_active * quant
        msgs = self._assemble(world_state, agent_params, [1, 1], [1, -1],
                              jnp.asarray([bid_quant, ask_quant], I32),
                              jnp.asarray([best_ask, best_bid], I32))
        return msgs, self._extras(bid_quant=bid_quant, ask_quant=ask_quant)

    # ------------------------------------------------------------------ #
    # messages
    # ------------------------------------------------------------------ #

    def get_messages(self, action, world_state: WorldState,
                     agent_state: MMEnvState, agent_params):
        """Action messages + cancel-all-and-repost with netting
        (reference: mm_env.py:1869-1913)."""
        action_msgs, extras = self.action_fn(action, world_state, agent_state,
                                             agent_params)
        size = self.cfg.num_messages_by_agent // 4
        cnl_bid = engine.get_cancel_msgs(
            world_state.bid_raw_orders, agent_params.trader_id, size, 1,
            world_state.time[0], world_state.time[1])
        cnl_ask = engine.get_cancel_msgs(
            world_state.ask_raw_orders, agent_params.trader_id, size, -1,
            world_state.time[0], world_state.time[1])
        cancel_msgs = jnp.concatenate([cnl_bid, cnl_ask], axis=0)
        action_msgs, cancel_msgs = filter_messages(action_msgs, cancel_msgs)
        return action_msgs, cancel_msgs, extras

    # ------------------------------------------------------------------ #
    # reward
    # ------------------------------------------------------------------ #

    def get_reward(self, world_state: WorldState, agent_state: MMEnvState,
                   agent_params, trades, bestasks, bestbids, ep_done_time):
        """All reward functions + fictional episode-end unwind trade
        (reference: mm_env.py:2247-2673). The unwind trade is injected into a
        local copy of the trades buffer only — it is never persisted."""
        cfg, wc, tick = self.cfg, self.world_config, self._tick()

        _, _, buys0, sells0, _, _ = extract_agent_trade_stats(
            trades, agent_params.trader_id)
        buyQuant0 = jnp.abs(buys0[:, TradeCol.QUANT]).sum()
        sellQuant0 = jnp.abs(sells0[:, TradeCol.QUANT]).sum()
        inv_before_final = agent_state.inventory + buyQuant0 - sellQuant0

        averageMidprice = ((bestbids[:, 0] + bestasks[:, 0]) / 2).mean()
        last_mid_price = (bestbids[-1, 0] + bestasks[-1, 0]) / 2

        if cfg.unwind_price == "mid_avg":
            unwind_price = averageMidprice
        elif cfg.unwind_price == "mid":
            unwind_price = last_mid_price
        elif cfg.unwind_price == "far_touch":
            unwind_price = jax.lax.cond(inv_before_final > 0,
                                        lambda: bestbids[-1][0],
                                        lambda: bestasks[-1][0])
        else:
            raise ValueError("Invalid unwind price type.")
        penalty = cfg.unwind_price_penalty * tick
        penalty = jax.lax.cond(inv_before_final > 0, lambda: penalty,
                               lambda: -penalty)

        def add_fictional(tr, price, quant):
            t = engine.create_trade(
                price, quant, wc.artificial_order_id_end_episode,
                wc.placeholder_order_id, 0, 0,
                wc.artificial_trader_id_end_episode, agent_params.trader_id)
            return engine.add_trade(tr, t)

        trades = jax.lax.cond(
            ep_done_time & (jnp.abs(inv_before_final) > 0),
            add_fictional, lambda tr, p, q: tr,
            trades, unwind_price - penalty,
            jnp.sign(inv_before_final) * jnp.abs(inv_before_final))
        forced_unwind = inv_before_final * ep_done_time

        _, otherTrades, agent_buys, agent_sells, pass_buys, pass_sells = \
            extract_agent_trade_stats(trades, agent_params.trader_id)

        mid_price_end = (bestbids[-1][0] + bestasks[-1][0]) / 2

        income = (agent_sells[:, 0].astype(F32) / tick
                  * jnp.abs(agent_sells[:, 1])).sum()
        outgoing = (agent_buys[:, 0].astype(F32) / tick
                    * jnp.abs(agent_buys[:, 1])).sum()
        buyQuant = jnp.abs(agent_buys[:, 1]).sum()
        sellQuant = jnp.abs(agent_sells[:, 1]).sum()
        new_inventory = agent_state.inventory + buyQuant - sellQuant

        rebate_value = (
            (pass_buys[:, 0].astype(F32) / tick
             * jnp.abs(pass_buys[:, 1])).sum()
            + (pass_sells[:, 0].astype(F32) / tick
               * jnp.abs(pass_sells[:, 1])).sum())
        rebate_income = rebate_value * (cfg.rebate_bps / 10_000)

        if cfg.reference_price == "mid_avg":
            ref_buy = ref_sell = reference_price = averageMidprice
        elif cfg.reference_price == "mid":
            ref_buy = ref_sell = reference_price = last_mid_price
        elif cfg.reference_price == "far_touch":
            ref_buy, ref_sell = bestasks[-1][0], bestbids[-1][0]
            reference_price = jax.lax.cond(new_inventory > 0,
                                           lambda: ref_buy, lambda: ref_sell)
        elif cfg.reference_price == "near_touch":
            ref_buy, ref_sell = bestbids[-1][0], bestasks[-1][0]
            reference_price = jax.lax.cond(new_inventory > 0,
                                           lambda: ref_buy, lambda: ref_sell)
        else:
            raise ValueError("Invalid reference price type.")

        PnL = income - outgoing + rebate_income
        new_cash_balance = agent_state.cash_balance + PnL
        inventoryValue = new_inventory * reference_price / tick
        netWorth = new_cash_balance + inventoryValue

        other_exec_quants = jnp.abs(otherTrades[:, 1]).sum()
        TradedVolume = buyQuant + sellQuant
        market_share = TradedVolume / (TradedVolume + other_exec_quants)

        # --- spooner family (reference :2412-2434) ------------------------
        InventoryPnL = agent_state.inventory \
            * (mid_price_end - world_state.mid_price) / tick
        buyPnL = (((ref_buy - agent_buys[:, 0]) / tick
                   * jnp.abs(agent_buys[:, 1])).sum())
        sellPnL = (((agent_sells[:, 0] - ref_sell) / tick
                    * jnp.abs(agent_sells[:, 1])).sum())
        r_spooner = buyPnL + sellPnL + rebate_income + InventoryPnL
        r_spooner_damped = r_spooner - cfg.inventoryPnL_eta * InventoryPnL
        r_spooner_asym_damped = buyPnL + sellPnL + rebate_income \
            + InventoryPnL - jnp.maximum(0, cfg.inventoryPnL_eta
                                         * InventoryPnL)
        r_spooner_asym_damped2 = buyPnL + sellPnL + rebate_income \
            + cfg.inventoryPnL_gamma * (
                InventoryPnL - jnp.maximum(0, cfg.inventoryPnL_eta
                                           * InventoryPnL))
        scaledInventoryPnL = InventoryPnL \
            // (jnp.abs(agent_state.inventory) + 1)
        r_spooner_scaled = buyPnL + sellPnL + rebate_income \
            + cfg.inventoryPnL_eta * (
                InventoryPnL - (1 - cfg.inventoryPnL_eta)
                * jnp.maximum(0, InventoryPnL))

        # --- complex (reference :2436-2450) --------------------------------
        inventory_change = buyQuant - sellQuant
        avg_buy_price = jnp.where(
            buyQuant > 0,
            (agent_buys[:, 0] / buyQuant * jnp.abs(agent_buys[:, 1])).sum(), 0)
        avg_sell_price = jnp.where(
            sellQuant > 0,
            (agent_sells[:, 0] / sellQuant
             * jnp.abs(agent_sells[:, 1])).sum(), 0)
        approx_realized = jnp.minimum(buyQuant, sellQuant) \
            * (avg_sell_price - avg_buy_price)
        approx_unrealized = jnp.where(
            inventory_change > 0,
            inventory_change * (averageMidprice - avg_buy_price),
            jnp.abs(inventory_change) * (avg_sell_price - averageMidprice))
        r_complex = approx_realized \
            + cfg.unrealizedPnL_lambda * approx_unrealized \
            + cfg.inventoryPnL_eta * jnp.minimum(
                InventoryPnL, InventoryPnL * cfg.inventoryPnL_eta)

        # --- portfolio value (reference :2452-2485) -------------------------
        r_portfolio_value = new_inventory * (reference_price / tick) \
            + new_cash_balance
        if cfg.reference_price in ("mid", "mid_avg"):
            old_reference_price = world_state.mid_price
        elif cfg.reference_price == "far_touch":
            old_reference_price = jax.lax.cond(
                agent_state.inventory > 0,
                lambda: world_state.best_asks[-1][0].astype(F32),
                lambda: world_state.best_bids[-1][0].astype(F32))
        elif cfg.reference_price == "near_touch":
            old_reference_price = jax.lax.cond(
                agent_state.inventory > 0,
                lambda: world_state.best_bids[-1][0].astype(F32),
                lambda: world_state.best_asks[-1][0].astype(F32))
        old_netWorth = old_reference_price / tick * agent_state.inventory \
            + agent_state.cash_balance
        delta_netWorth = netWorth - old_netWorth

        rewards = {
            "portfolio_value": r_portfolio_value,
            "buy_sell_pnl": buyPnL + sellPnL,
            "complex": r_complex,
            "zero_inv": -jnp.abs(new_inventory).astype(F32),
            "spooner": r_spooner,
            "spooner_damped": r_spooner_damped,
            "spooner_asym_damped": r_spooner_asym_damped,
            "spooner_asym_damped2": r_spooner_asym_damped2,
            "spooner_scaled": r_spooner_scaled,
            "delta_portfolio_value": delta_netWorth,
        }
        if cfg.reward_function not in rewards:
            raise ValueError(f"Invalid reward_function {cfg.reward_function}")
        reward = rewards[cfg.reward_function]

        # inventory penalties (reference :2516-2537)
        if cfg.inv_penalty == "none":
            inv_pen = 0.0
        elif cfg.inv_penalty == "linear":
            inv_pen = -jnp.abs(new_inventory)
        elif cfg.inv_penalty == "quadratic":
            inv_pen = -(new_inventory ** 2) / cfg.inv_penalty_quadratic_factor
        elif cfg.inv_penalty == "exp4":
            inv_pen = -jnp.exp(new_inventory * 4)
        elif cfg.inv_penalty == "threshold":
            inv_pen = jax.lax.cond(
                jnp.abs(new_inventory) > cfg.inv_penalty_threshold,
                lambda: -1.0 * (new_inventory ** 2)
                / cfg.inv_penalty_quadratic_factor,
                lambda: 0.0)
        else:
            raise ValueError("Invalid inventory penalty")
        reward = reward + cfg.inv_penalty_lambda * inv_pen

        if cfg.clip_reward:
            reward = jnp.clip(reward, -10000, 10000)
        if cfg.volume_traded_bonus == "market_share":
            reward = reward + jnp.abs(reward) * market_share
        if cfg.exclude_extreme_spreads:
            all_spreads = world_state.best_asks[:, 0] \
                - world_state.best_bids[:, 0]
            mids = (world_state.best_asks[:, 0]
                    + world_state.best_bids[:, 0]) / 2
            any_large = jnp.any(all_spreads / mids > 0.1)
            reward = jax.lax.cond(any_large, lambda: 0.0, lambda: reward)

        extras = {
            "reward": reward,
            "reward_portfolio_value": r_portfolio_value,
            "end_of_ep_pv": r_portfolio_value * ep_done_time,
            "reward_complex": r_complex,
            "reward_spooner": r_spooner,
            "reward_spooner_damped": r_spooner_damped,
            "reward_spooner_asym_damped": r_spooner_asym_damped,
            "reward_spooner_asym_damped2": r_spooner_asym_damped2,
            "reward_spooner_scaled": r_spooner_scaled,
            "reward_delta_portfolio_value": delta_netWorth,
            "forced_unwind": forced_unwind,
            "market_share": market_share,
            "inventoryValue": inventoryValue,
            "delta_mid_price": mid_price_end - world_state.mid_price,
            "buyPnL": buyPnL,
            "sellPnL": sellPnL,
            "invPnL": InventoryPnL,
            "PnL": PnL,
            "cash_balance": new_cash_balance,
            "netWorth": netWorth,
            "end_inventory": new_inventory,
            "mid_price": mid_price_end,
            "buyQuant": buyQuant,
            "sellQuant": sellQuant,
            "approx_realized_pnl": approx_realized,
            "approx_unrealized_pnl": approx_unrealized,
            "InventoryPnL": InventoryPnL,
            "scaledInventoryPnL": scaledInventoryPnL,
            "other_exec_quants": other_exec_quants,
            "averageMidprice": averageMidprice,
        }
        return reward / cfg.reward_scaling_quo, extras

    # ------------------------------------------------------------------ #
    # state / info / obs
    # ------------------------------------------------------------------ #

    def update_state_and_get_done_and_info(self, world_state: WorldState,
                                           agent_state_old: MMEnvState,
                                           extras):
        """(reference: mm_env.py:2677-2736)"""
        agent_state = MMEnvState(
            posted_distance_bid=extras["bid_distance_from_best"],
            posted_distance_ask=extras["ask_distance_from_best"],
            inventory=extras["end_inventory"],
            total_PnL=agent_state_old.total_PnL + extras["PnL"],
            cash_balance=extras["cash_balance"])
        # MM never terminates; keep the flag mapped over instances.
        done = jnp.zeros_like(extras["end_inventory"], dtype=bool)
        info = {
            "reward": extras["reward"],
            "reward_portfolio_value": extras["reward_portfolio_value"],
            "reward_spooner": extras["reward_spooner"],
            "end_of_ep_pv": extras["end_of_ep_pv"],
            "reward_spooner_damped": extras["reward_spooner_damped"],
            "reward_spooner_asym_damped": extras["reward_spooner_asym_damped"],
            "reward_spooner_asym_damped2":
                extras["reward_spooner_asym_damped2"],
            "reward_delta_pv": extras["reward_delta_portfolio_value"],
            "total_PnL": agent_state.total_PnL,
            "done": done,
            "inventory": agent_state.inventory,
            "delta_mid_price": extras["delta_mid_price"],
            "market_share": extras["market_share"],
            "buyPnL": extras["buyPnL"],
            "forced_unwind": extras["forced_unwind"],
            "invPnL": extras["invPnL"],
            "posted_bid_price": extras["posted_bid_price"],
            "posted_ask_price": extras["posted_ask_price"],
            "bid_distance_from_best": extras["bid_distance_from_best"],
            "ask_distance_from_best": extras["ask_distance_from_best"],
            "ask_quant": extras["ask_quant"],
            "bid_quant": extras["bid_quant"],
            "sellPnL": extras["sellPnL"],
            "inventoryValue": extras["inventoryValue"],
        }
        return agent_state, done, info

    def get_observation(self, world_state, agent_state, agent_param,
                        total_messages, old_time, old_mid_price,
                        lob_state_before, normalize, flatten):
        """(reference: mm_env.py:2755-2788)"""
        if self.cfg.observation_space == "engineered":
            return self._obs_engineered(world_state, agent_state, normalize,
                                        flatten)
        elif self.cfg.observation_space == "basic":
            return self._obs_basic(world_state, agent_state, normalize,
                                   flatten)
        elif self.cfg.observation_space == "messages":
            if total_messages is None:   # reset path: blank message window
                n_msgs = self.cfg.num_messages_by_agent \
                    + self.world_config.n_data_msg_per_step
                total_messages = jnp.zeros((n_msgs, 8), dtype=I32)
            return total_messages
        elif self.cfg.observation_space == "messages_new_tokenizer":
            from .tokenizer import TokenizerConfig, tokenize_observation
            n_msgs = self.cfg.num_messages_by_agent \
                + self.world_config.n_data_msg_per_step
            if total_messages is None:     # reset path (reference :443)
                total_messages = jnp.zeros((n_msgs, 8), dtype=I32)
            if lob_state_before is None:
                from ..lob import queries as _q
                lob_state_before = _q.get_L2_state(
                    world_state.ask_raw_orders, world_state.bid_raw_orders,
                    10, self.world_config)
            return tokenize_observation(TokenizerConfig(), world_state,
                                        total_messages, old_mid_price,
                                        lob_state_before)
        else:
            raise ValueError(
                f"Invalid observation_space {self.cfg.observation_space}")

    @staticmethod
    def _normalize_obs(obs, means, stds):
        return jax.tree.map(lambda x, m, s: (x - m) / s, obs, means, stds)

    def _obs_basic(self, world_state, agent_state, normalize, flatten=True):
        """(reference: mm_env.py:2963-3000)"""
        spread = jnp.abs(world_state.best_asks[-1][0]
                         - world_state.best_bids[-1][0])
        obs = {"spread": spread, "inventory": agent_state.inventory}
        means = {"spread": 0, "inventory": 0}
        stds = {"spread": 1e4, "inventory": 10}
        if normalize:
            obs = self._normalize_obs(obs, means, stds)
        if flatten:
            obs, _ = jax.flatten_util.ravel_pytree(obs)
        return obs

    def _obs_engineered(self, world_state, agent_state, normalize,
                        flatten=True):
        """10 features in fixed_time mode, 8 in fixed_steps
        (reference: mm_env.py:3004-3154)."""
        wc = self.world_config
        bid_vol_tot = queries.get_volume(world_state.bid_raw_orders)
        ask_vol_tot = queries.get_volume(world_state.ask_raw_orders)
        spread = jnp.abs(world_state.best_asks[-1][0]
                         - world_state.best_bids[-1][0])
        obs = {
            "p_bid": world_state.best_bids[-1][0],
            "p_ask": world_state.best_asks[-1][0],
            "spread": spread,
            "q_bid": bid_vol_tot,
            "q_ask": ask_vol_tot,
            "mid_price": world_state.mid_price,
            "step_counter": world_state.step_counter,
            "inventory": agent_state.inventory,
        }
        means = {k: 0 for k in obs}
        stds = {"p_bid": 1e6, "p_ask": 1e6, "spread": 1e4, "q_bid": 1000,
                "q_ask": 1000, "mid_price": 1e6, "step_counter": 10,
                "inventory": 10}
        if wc.ep_type == "fixed_time":
            time = world_state.time[0] + world_state.time[1] / 1e9
            time_elapsed = time - (world_state.init_time[0]
                                   + world_state.init_time[1] / 1e9)
            obs["delta_time"] = world_state.delta_time
            obs["time_remaining"] = wc.episode_time - time_elapsed
            means["delta_time"] = 0
            means["time_remaining"] = 0
            stds["delta_time"] = 10
            stds["time_remaining"] = wc.episode_time
        if normalize:
            obs = self._normalize_obs(obs, means, stds)
        if flatten:
            obs, _ = jax.flatten_util.ravel_pytree(obs)
        return obs

    # ------------------------------------------------------------------ #
    # spaces
    # ------------------------------------------------------------------ #

    def action_space(self):
        """(reference: mm_env.py:3170-3191)"""
        if self.cfg.action_space == "fixed_prices":
            return spaces.Box(0, 100, (self.cfg.n_actions,), dtype=I32)
        return spaces.Discrete(self.cfg.n_actions)

    def observation_space(self, num_msgs_per_step: int | None = None):
        """(reference: mm_env.py:3195-3223). The message-window spaces
        observe the whole step's message stream, so the orchestrator passes
        its total ``num_msgs_per_step`` (this type's own count + data is only
        correct in single-type single-instance configs)."""
        cfg, wc = self.cfg, self.world_config
        if cfg.observation_space == "engineered":
            n = 10 if wc.ep_type == "fixed_time" else 8
            return spaces.Box(-1000, 1000, (n,), dtype=F32)
        elif cfg.observation_space == "basic":
            return spaces.Box(-1000, 1000, (2,), dtype=F32)
        n_msgs = (num_msgs_per_step if num_msgs_per_step is not None
                  else cfg.num_messages_by_agent + wc.n_data_msg_per_step)
        if cfg.observation_space == "messages":
            return spaces.Box(-wc.maxint, wc.maxint, (n_msgs, 8), dtype=I32)
        elif cfg.observation_space == "messages_new_tokenizer":
            from .tokenizer import TokenizerConfig
            tok = TokenizerConfig()
            return spaces.Box(0, tok.TOTAL_NUM_TOKENS - 1,
                              (n_msgs * 13 + 84,), dtype=I32)
        raise ValueError(f"Invalid observation_space {cfg.observation_space}")
