"""Object-oriented order-book wrapper.

Parity reference: gymnax_exchange/jaxob/jorderbook.py (LobState NamedTuple +
OrderBook class registered as a pytree with the config as static aux data,
:17-285). Used by standalone demos and notebooks; the env layer calls the
functional engine directly, as in the reference.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp

from ..config.structs import LobConfig
from . import engine, engine_sorted, queries

I32 = jnp.int32


class LobState(NamedTuple):
    asks: jnp.ndarray
    bids: jnp.ndarray
    trades: jnp.ndarray
    key: chex.PRNGKey


class OrderBook:
    """Stateless convenience wrapper; all methods are jittable (the instance
    is a pytree with cfg as static aux data, reference jorderbook.py:271-285).
    """

    def __init__(self, cfg: Optional[LobConfig] = None):
        self.cfg = cfg if cfg is not None else LobConfig()

    # ------------------------------------------------------------------ #

    @partial(jax.jit, static_argnums=(0,))
    def init(self) -> LobState:
        return LobState(
            engine.init_orderside(self.cfg.nOrders),
            engine.init_orderside(self.cfg.nOrders),
            engine.init_trades(self.cfg.nTrades),
            jax.random.PRNGKey(self.cfg.seed))

    def reset(self, l2_book: Optional[jnp.ndarray] = None,
              time: Optional[jnp.ndarray] = None) -> LobState:
        """Empty book, optionally re-initialised from an L2 snapshot
        (reference :41-53)."""
        state = self.init()
        if l2_book is not None:
            if time is None:
                time = jnp.array([0, 0])
            msgs = queries.init_msgs_from_l2(self.cfg, l2_book, time=time)
            state = self.process_orders_array(state, msgs)
        return state

    # ------------------------------------------------------------------ #

    def process_order(self, state: LobState, quote: Dict) -> LobState:
        """Apply one order given as a human-friendly dict
        (reference :55-94)."""
        inttype = {"limit": 1, "cancel": 2, "delete": 2, "market": 1}[
            quote["type"]]
        intside = 1 if quote["side"] == "bid" else -1
        if quote["type"] == "market":
            intside = -intside
        ts, tns = str(quote["timestamp"]).split(".")
        msg = jnp.array([inttype, intside, quote["quantity"], quote["price"],
                         quote["trade_id"], quote["order_id"],
                         int(ts), int(tns)], dtype=I32)
        return self.process_order_array(state, msg)

    @partial(jax.jit, static_argnums=(0,))
    def process_order_array(self, state: LobState, quote: jax.Array
                            ) -> LobState:
        """Apply one (8,) message (reference :96-110)."""
        asks, bids, trades, key = state
        key, split_key = jax.random.split(key)
        asks, bids, trades = engine_sorted.get_engine(self.cfg).apply_message(
            self.cfg, (asks, bids, trades), split_key, quote.astype(I32))
        return LobState(asks, bids, trades, key)

    @partial(jax.jit, static_argnums=(0,))
    def process_orders_array(self, state: LobState, msgs: jax.Array
                             ) -> LobState:
        """Apply an (N, 8) message array in sequence (reference :112-121)."""
        asks, bids, trades, key = state
        key, split_key = jax.random.split(key)
        new = engine_sorted.get_engine(self.cfg).scan_messages(
            self.cfg, split_key, msgs.astype(I32), (asks, bids, trades))
        return LobState(*new, key)

    @partial(jax.jit, static_argnums=(0, 3))
    def process_orders_array_l2(self, state: LobState, msgs: jax.Array,
                                n_levels: int):
        """Apply messages and also return the L2 book state history
        (reference :123-139)."""
        asks, bids, trades, key = state
        key, split_key = jax.random.split(key)
        eng = engine_sorted.get_engine(self.cfg)
        all_asks, all_bids, trades = eng.scan_messages_save_states(
            self.cfg, split_key, msgs.astype(I32), (asks, bids, trades),
            msgs.shape[0])
        l2 = jax.vmap(queries.get_L2_state, (0, 0, None, None))(
            all_asks, all_bids, n_levels, self.cfg)
        return LobState(all_asks[-1], all_bids[-1], trades, key), l2

    # ------------------------------------------------------------------ #
    # queries (reference :141-269)
    # ------------------------------------------------------------------ #

    def get_L2_state(self, state: LobState, n_levels: int):
        return queries.get_L2_state(state.asks, state.bids, n_levels,
                                    self.cfg)

    def get_best_ask(self, state: LobState):
        return queries.get_best_ask(self.cfg, state.asks)

    def get_best_bid(self, state: LobState):
        return queries.get_best_bid(self.cfg, state.bids)

    def get_best_bid_and_ask(self, state: LobState):
        return queries.get_best_bid_and_ask(self.cfg, state.asks, state.bids)

    def get_volume_at_price(self, state: LobState, side: int, price: int):
        book = state.bids if side == 1 else state.asks
        return queries.get_volume_at_price(book, price)

    def get_order_by_id(self, state: LobState, side: int, order_id: int):
        book = state.bids if side == 1 else state.asks
        return queries.get_order_by_id(book, order_id)

    # pytree registration (reference :271-285): cfg is static aux data so
    # jitted methods retrace per configuration.
    def _tree_flatten(self):
        return (), (self.cfg,)

    @classmethod
    def _tree_unflatten(cls, aux, children):
        return cls(cfg=aux[0])


jax.tree_util.register_pytree_node(
    OrderBook, OrderBook._tree_flatten, OrderBook._tree_unflatten)
