"""Order-book query functions.

Parity reference: the helper section of
gymnax_exchange/jaxob/JaxOrderBookArrays.py (:883-1264).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import constants as cst
from ..config.constants import OrderCol, TradeCol

I32 = jnp.int32


def get_volume_at_price(side: jax.Array, price) -> jax.Array:
    """Total standing quantity at a price level (reference :906-917)."""
    return jnp.sum(jnp.where(side[:, OrderCol.PRICE] == price,
                             side[:, OrderCol.QUANT], 0))


def get_volume(side: jax.Array) -> jax.Array:
    """Total standing quantity on a side (reference :919-930)."""
    return jnp.sum(jnp.where(side[:, OrderCol.PRICE] != cst.EMPTY_SLOT,
                             side[:, OrderCol.QUANT], 0))


def get_best_ask(cfg, asks: jax.Array) -> jax.Array:
    """Lowest ask price, or -1 if the side is empty (reference :932-941)."""
    m = jnp.min(jnp.where(asks[:, OrderCol.PRICE] == -1, cfg.maxint,
                          asks[:, OrderCol.PRICE]))
    return jnp.where(m == cfg.maxint, -1, m)


def get_best_bid(cfg, bids: jax.Array) -> jax.Array:
    """Highest bid price, or -1 if empty (reference :943-951)."""
    return jnp.max(bids[:, OrderCol.PRICE])


def get_best_bid_and_ask(cfg, askside, bidside):
    return get_best_ask(cfg, askside), get_best_bid(cfg, bidside)


def best_bid_ask_incl_quants(cfg, askside, bidside):
    """Best (price, volume-at-price) pairs for both sides (reference :967-984).
    Returns (best_ask, best_bid) as (2,) int32 arrays."""
    best_ask, best_bid = get_best_bid_and_ask(cfg, askside, bidside)
    best_ask_q = get_volume_at_price(askside, best_ask)
    best_bid_q = get_volume_at_price(bidside, best_bid)
    return (jnp.stack([best_ask, best_ask_q]).astype(I32),
            jnp.stack([best_bid, best_bid_q]).astype(I32))


def get_agent_trades(trades: jax.Array, agent_id):
    """Split trades into (agent, other) by trader id (reference :895-904).
    Empty rows (price < 0) are zeroed first."""
    executed = jnp.where((trades[:, 0] >= 0)[:, None], trades, 0)
    mask = ((agent_id == executed[:, TradeCol.PASS_TID])
            | (agent_id == executed[:, TradeCol.AGR_TID]))
    agent = jnp.where(mask[:, None], executed, 0)
    other = jnp.where(mask[:, None], 0, executed)
    return agent, other


def get_init_volume_at_price(side: jax.Array, price, cfg) -> jax.Array:
    """Volume from initial-book orders at a price (reference :1030-1046)."""
    oid = side[:, OrderCol.OID]
    return jnp.sum(jnp.where(
        (side[:, OrderCol.PRICE] == price)
        & (oid <= cfg.init_id) & (oid >= cfg.init_id - cfg.book_depth * 2),
        side[:, OrderCol.QUANT], 0))


def _lookup(side: jax.Array, mask: jax.Array) -> jax.Array:
    idx = jnp.where(mask, size=1, fill_value=-1)[0][0]
    return jax.lax.cond(
        idx == -1,
        lambda i: cst.NEGATIVE_RETURN_ID * jnp.ones((6,), dtype=I32),
        lambda i: side[i],
        idx)


def get_order_by_id(side: jax.Array, order_id) -> jax.Array:
    """First order matching an id; -99 row if absent (reference :1048-1071)."""
    return _lookup(side, side[:, OrderCol.OID] == order_id)


def get_order_by_tid(side: jax.Array, trader_id) -> jax.Array:
    """(reference :1074-1097)"""
    return _lookup(side, side[:, OrderCol.TID] == trader_id)


def get_order_by_id_and_price(side: jax.Array, order_id, price) -> jax.Array:
    """(reference :1099-1124)"""
    return _lookup(side, (side[:, OrderCol.OID] == order_id)
                   & (side[:, OrderCol.PRICE] == price))


def get_order_by_time(side: jax.Array, time_s, time_ns) -> jax.Array:
    """(reference :1127-1154)"""
    return _lookup(side, (side[:, OrderCol.TIME_S] == time_s)
                   & (side[:, OrderCol.TIME_NS] == time_ns))


def get_order_by_time_and_price(side: jax.Array, time_s, time_ns, price
                                ) -> jax.Array:
    """Time+price lookup with a time-only fallback (reference :1156-1198)."""
    exact = (side[:, OrderCol.TIME_S] == time_s) \
        & (side[:, OrderCol.TIME_NS] == time_ns) \
        & (side[:, OrderCol.PRICE] == price)
    time_only = (side[:, OrderCol.TIME_S] == time_s) \
        & (side[:, OrderCol.TIME_NS] == time_ns)
    idx = jnp.where(exact, size=1, fill_value=-1)[0][0]
    idx2 = jnp.where(time_only, size=1, fill_value=-1)[0][0]
    idx = jnp.where(idx == -1, idx2, idx)
    return jax.lax.cond(
        idx == -1,
        lambda i: cst.NEGATIVE_RETURN_ID * jnp.ones((6,), dtype=I32),
        lambda i: side[i],
        idx)


def get_order_ids(side: jax.Array) -> jax.Array:
    """Unique order ids, padded with 1 (reference :1200-1209)."""
    return jnp.unique(side[:, OrderCol.OID], size=side.shape[0], fill_value=1)


def get_L2_state(asks: jax.Array, bids: jax.Array, n_levels: int, cfg
                 ) -> jax.Array:
    """Top-n (price, volume) levels, interleaved ask/bid and flattened
    (reference: get_L2_state :1231-1264). Matches the reference's
    jnp.unique(size=..)-based sorted-with-fill semantics, including the -1 /
    maxint placeholder encoding."""
    bid_prices = -1 * jnp.unique(-1 * bids[:, OrderCol.PRICE],
                                 size=n_levels, fill_value=1)
    ask_prices = jnp.unique(
        jnp.where(asks[:, OrderCol.PRICE] == -1, cfg.maxint,
                  asks[:, OrderCol.PRICE]),
        size=n_levels, fill_value=-1)
    ask_prices = jnp.where(ask_prices == -1, cfg.maxint, ask_prices)
    bid_prices = jnp.where(bid_prices == -1, -cfg.maxint, bid_prices)

    bid_vols = jax.vmap(get_volume_at_price, (None, 0))(bids, bid_prices)
    ask_vols = jax.vmap(get_volume_at_price, (None, 0))(asks, ask_prices)
    bid_vols = jnp.where(bid_vols < 0, 0, bid_vols)
    ask_vols = jnp.where(ask_vols < 0, 0, ask_vols)

    l2 = jnp.hstack((
        jnp.stack((ask_prices, ask_vols)).T,
        jnp.stack((bid_prices, bid_vols)).T,
    )).flatten()
    return l2


def init_msgs_from_l2(cfg, book_l2: jax.Array, time=None) -> jax.Array:
    """Messages (limit orders) reconstructing a book from one L2 snapshot
    (reference: init_msgs_from_l2 :999-1028). L2 layout: interleaved
    [ask_p, ask_q, bid_p, bid_q] * n_levels."""
    n_levels = book_l2.shape[0] // 4
    data = book_l2.reshape(n_levels * 2, 2)
    out = jnp.zeros((n_levels * 2, 8), dtype=I32)
    if time is None:
        time = jnp.array(cst.START_OF_DAY)
    out = (out
           .at[:, 3].set(data[:, 0])
           .at[:, 2].set(data[:, 1])
           .at[:, 0].set(1)
           .at[0:n_levels * 4:2, 1].set(-1)
           .at[1:n_levels * 4:2, 1].set(1)
           .at[:, 4].set(cfg.init_id - jnp.arange(0, n_levels * 2))
           .at[:, 5].set(cfg.init_id)
           .at[:, 6].set(time[0])
           .at[:, 7].set(time[1]))
    return out
