"""TPU-native limit-order-book matching engine (functional core).

Parity reference: gymnax_exchange/jaxob/JaxOrderBookArrays.py. Behaviour is
semantically identical (including the reference's edge-case quirks, which are
called out inline), but the *implementation* is redesigned for TPU:

* The reference matches an incoming order with a ``lax.while_loop`` that
  repeatedly reduces over the whole book side to find the best order
  (JaxOrderBookArrays.py:284-331). Data-dependent loop trip counts serialise
  terribly under vmap (every env waits for the slowest env's loop).

* Here matching is **closed-form and fully vectorised**: for each standing
  order ``i`` on the opposing side, the filled quantity is

      fill_i = clip(q_incoming - S_i, 0, q_i)

  where ``S_i`` is the total quantity of *crossing* standing orders with
  strictly higher price-time priority. ``S_i`` is computed from an (N, N)
  pairwise priority matrix contracted against the quantity vector — a single
  batched mat-vec that XLA maps onto the MXU, with zero data-dependent control
  flow. This is bit-identical to sequential price-time-priority matching
  (priority = (price, time_s, time_ns, slot index) lexicographic, matching the
  reference's ``_get_top_{bid,ask}_order_idx`` + ``jnp.where(size=1)``
  first-index tie-break).

Book side layout: (nOrders, 6) int32, columns per ``OrderCol``; empty slot
rows are all -1. Trades: (nTrades, 8) int32 per ``TradeCol``.

Messages are flat (8,) int32 vectors (``MsgCol``) — no Python dict assembly
in the hot path (the reference builds a dict per message,
JaxOrderBookArrays.py:575-582).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import constants as cst
from ..config.constants import MsgCol, OrderCol, TradeCol

I32 = jnp.int32


# --------------------------------------------------------------------------- #
# Construction helpers
# --------------------------------------------------------------------------- #

def init_orderside(n_orders: int = 100) -> jax.Array:
    """Empty book side (reference: init_orderside, JaxOrderBookArrays.py:987)."""
    return jnp.full((n_orders, 6), -1, dtype=I32)


def init_trades(n_trades: int = 100) -> jax.Array:
    return jnp.full((n_trades, 8), -1, dtype=I32)


def _remove_zero_neg_quant(side: jax.Array) -> jax.Array:
    """Clear rows with quantity <= 0 (reference: _removeZeroNegQuant :86-90)."""
    return jnp.where((side[:, OrderCol.QUANT] <= 0)[:, None],
                     jnp.full_like(side, -1), side)


def _first_row_with_neg1(arr2d: jax.Array) -> jax.Array:
    """Row index of the first row containing any -1; -1 if none.

    Matches ``jnp.where(arr == -1, size=1, fill_value=-1)[0]`` row-major
    semantics used throughout the reference (e.g. add_order :73). A -1 index
    deliberately wraps to the *last* row on ``.at[idx]`` updates — the
    reference relies on that when the buffer is full.
    """
    row_has = jnp.any(arr2d == -1, axis=1)
    idx = jnp.argmax(row_has)
    return jnp.where(jnp.any(row_has), idx, -1).astype(I32)


def _first_true(mask: jax.Array) -> jax.Array:
    """First index where mask is True; -1 if none (jnp.where(size=1) parity)."""
    idx = jnp.argmax(mask)
    return jnp.where(jnp.any(mask), idx, -1).astype(I32)


# --------------------------------------------------------------------------- #
# Core operations
# --------------------------------------------------------------------------- #

def add_order(side: jax.Array, price, quant, oid, tid, time_s, time_ns
              ) -> jax.Array:
    """Insert an order into the first empty slot (reference: add_order :62-83).

    Negative quantities are floored at 0 and then swept by
    ``_remove_zero_neg_quant`` so they never enter the book.
    """
    idx = _first_row_with_neg1(side)
    row = jnp.stack([price, jnp.maximum(0, quant), oid, tid,
                     time_s, time_ns]).astype(I32)
    side = side.at[idx, :].set(row)
    return _remove_zero_neg_quant(side)


def _priority_better(side: jax.Array, crossing: jax.Array, is_ask_side: bool
                     ) -> jax.Array:
    """(N, N) bool matrix: better[j, i] == "crossing order j has strictly
    higher price-time priority than order i".

    Priority is lexicographic (price, time_s, time_ns, slot index); for the
    ask side lower price wins, for the bid side higher price wins — identical
    to the reference's top-order selection (:241-268).
    """
    p = side[:, OrderCol.PRICE]
    ts = side[:, OrderCol.TIME_S]
    tn = side[:, OrderCol.TIME_NS]
    n = p.shape[0]
    idx = jax.lax.broadcasted_iota(I32, (n, n), 0)      # j
    idx_i = jax.lax.broadcasted_iota(I32, (n, n), 1)    # i

    pj, pi = p[:, None], p[None, :]
    if is_ask_side:
        price_better = pj < pi
    else:
        price_better = pj > pi
    price_eq = pj == pi
    tsj, tsi = ts[:, None], ts[None, :]
    tnj, tni = tn[:, None], tn[None, :]
    time_better = (tsj < tsi) | ((tsj == tsi) & ((tnj < tni) |
                                                 ((tnj == tni) & (idx < idx_i))))
    better = price_better | (price_eq & time_better)
    return better & crossing[:, None]


def _match_side(nTrades: int, opp: jax.Array, trades: jax.Array,
                qtm, price, agr_oid, time_s, time_ns, agr_tid, side_sign,
                is_ask_side: bool):
    """Wrapper producing the final (opp, qtm_left, trades) tuple."""
    p = opp[:, OrderCol.PRICE]
    q = opp[:, OrderCol.QUANT]
    oid = opp[:, OrderCol.OID]
    tid = opp[:, OrderCol.TID]
    valid = p != -1
    if is_ask_side:
        crossing = valid & (p <= price)
    else:
        crossing = valid & (p >= price)

    better = _priority_better(opp, crossing, is_ask_side)
    S = jnp.sum(jnp.where(better, q[:, None], 0), axis=0).astype(I32)
    fill = jnp.where(crossing, jnp.clip(qtm - S, 0, q), 0).astype(I32)
    qtm_left = (qtm - jnp.sum(fill)).astype(I32)

    filled = fill > 0
    rank = jnp.sum(better & filled[:, None], axis=0).astype(I32)

    empty_mask = trades[:, 4] == -1  # reference quirk: col 4 (time_s), :205
    first_empty = _first_true(empty_mask)
    base = jnp.where(first_empty >= 0, first_empty, nTrades - 1)
    slot = base + rank
    overflow = filled & (slot >= nTrades - 1)
    max_rank_overflow = jnp.max(jnp.where(overflow, rank, -1))
    write = filled & ((slot < nTrades - 1) | (rank == max_rank_overflow))
    slot = jnp.clip(slot, 0, nTrades - 1)

    trade_rows = jnp.stack([
        p,
        (-side_sign * fill).astype(I32),
        oid,
        jnp.broadcast_to(jnp.asarray(agr_oid, I32), p.shape),
        jnp.broadcast_to(jnp.asarray(time_s, I32), p.shape),
        jnp.broadcast_to(jnp.asarray(time_ns, I32), p.shape),
        tid,
        jnp.broadcast_to(jnp.asarray(agr_tid, I32), p.shape),
    ], axis=1)

    safe_slot = jnp.where(write, slot, nTrades)  # out-of-range rows dropped
    trades = trades.at[safe_slot, :].set(trade_rows, mode="drop")

    # book update after trade rows captured the pre-fill ids
    new_q = (q - fill).astype(I32)
    opp = opp.at[:, OrderCol.QUANT].set(new_q)
    opp = _remove_zero_neg_quant(opp)
    return opp, qtm_left, trades


# --------------------------------------------------------------------------- #
# Cancellation
# --------------------------------------------------------------------------- #

def _init_id_match_idx(cfg, side: jax.Array, price, quant) -> jax.Array:
    """Fallback: cancel against an initial-book order at the same price
    (reference: get_init_id_match :120-139)."""
    oid = side[:, OrderCol.OID]
    m = ((side[:, OrderCol.PRICE] == price)
         & (oid <= cfg.init_id)
         & (oid >= cfg.init_id - cfg.book_depth * 2)
         & (side[:, OrderCol.QUANT] >= quant))
    return _first_true(m)


def _random_id_match_idx(key, side: jax.Array, price, quant,
                         require_quant: bool) -> jax.Array:
    """Random-order cancel fallback (reference: get_random_id_match :141-155
    and get_random_large_id_match :157-164)."""
    m = side[:, OrderCol.PRICE] == price
    if require_quant:
        m = m & (side[:, OrderCol.QUANT] >= quant)
    order_ids = jnp.where(m, side[:, OrderCol.OID], 0)
    key, _ = jax.random.split(key)
    chosen = jax.random.choice(key, order_ids,
                               p=jnp.abs(jnp.sign(order_ids)).astype(jnp.float32))
    return _first_true(side[:, OrderCol.OID] == chosen)


def cancel_order(cfg, key, side: jax.Array, msg: jax.Array) -> jax.Array:
    """Remove quantity from the order matching the message's order id
    (reference: cancel_order :93-117). If no id matches, falls back to
    initial-book orders at the same price; cancel_mode 2/3 adds a random
    fallback. A still-unmatched cancel subtracts from row -1 (the last row) —
    a reference quirk kept for bit parity.
    """
    price = msg[MsgCol.PRICE]
    quant = msg[MsgCol.QUANT]
    idx = _first_true(side[:, OrderCol.OID] == msg[MsgCol.OID])
    init_idx = _init_id_match_idx(cfg, side, price, quant)
    idx = jnp.where(idx == -1, init_idx, idx)
    if cfg.cancel_mode in (2, 3):
        rand_idx = _random_id_match_idx(key, side, price, quant,
                                        require_quant=True)
        if cfg.cancel_mode == 3:
            # the reference threads the once-split key into the large-order
            # fallback (get_random_id_match :149-154)
            inner_key, _ = jax.random.split(key)
            rand_large = _random_id_match_idx(inner_key, side, price, quant,
                                              require_quant=False)
            rand_idx = jnp.where(rand_idx == -1, rand_large, rand_idx)
        idx = jnp.where(idx == -1, rand_idx, idx)
    side = side.at[idx, OrderCol.QUANT].set(side[idx, OrderCol.QUANT] - quant)
    return _remove_zero_neg_quant(side)


# --------------------------------------------------------------------------- #
# Message handlers (type/side dispatch targets)
# --------------------------------------------------------------------------- #

def _evict_worst_if_full(side: jax.Array, is_bid_side: bool) -> jax.Array:
    """If the side is full, clear every order at the worst price to make room
    (reference: check_book_fill blocks in bid_lim/ask_lim :395-408, :484-497).
    Runs unconditionally before adding — even for zero-quantity messages,
    matching the reference."""
    p = side[:, OrderCol.PRICE]
    full = jnp.all(p >= 0)
    worst = jnp.min(p) if is_bid_side else jnp.max(p)
    cleared = jnp.where((p == worst)[:, None], jnp.full_like(side, -1), side)
    return jnp.where(full, cleared, side)


def bid_lim(cfg, msg, askside, bidside, trades):
    """Incoming bid limit order (reference: bid_lim :357-420): match against
    asks, then add the remainder to the bid side (suppressed for type-4 under
    IOC/MKT interpretation)."""
    askside, qtm_left, trades = _match_side(
        cfg.nTrades, askside, trades,
        msg[MsgCol.QUANT], msg[MsgCol.PRICE], msg[MsgCol.OID],
        msg[MsgCol.TIME_S], msg[MsgCol.TIME_NS], msg[MsgCol.TID],
        side_sign=msg[MsgCol.SIDE], is_ask_side=True)

    add_price = msg[MsgCol.PRICE]
    if cfg.type_4_interpretation == cst.Type4.MKT:
        # reference sets the price *after* matching on the bid side (:391-392)
        add_price = jnp.asarray(cfg.maxint, I32)

    if cfg.check_book_fill:
        bidside = _evict_worst_if_full(bidside, is_bid_side=True)

    bids_added = add_order(bidside, add_price, qtm_left, msg[MsgCol.OID],
                           msg[MsgCol.TID], msg[MsgCol.TIME_S],
                           msg[MsgCol.TIME_NS])
    if cfg.type_4_interpretation in (cst.Type4.IOC, cst.Type4.MKT):
        # type-4 remainders are not added (the evicted-but-not-added book is
        # kept for type 4 — reference quirk, :418)
        bids = jnp.where(msg[MsgCol.TYPE] == 4, bidside, bids_added)
    else:
        bids = bids_added
    return askside, bids, trades


def ask_lim(cfg, msg, askside, bidside, trades):
    """Incoming ask limit order (reference: ask_lim :446-508)."""
    match_price = msg[MsgCol.PRICE]
    if cfg.type_4_interpretation == cst.Type4.MKT:
        # asymmetric to bid_lim: price forced to 0 *before* matching (:471-472)
        match_price = jnp.asarray(0, I32)

    bidside, qtm_left, trades = _match_side(
        cfg.nTrades, bidside, trades,
        msg[MsgCol.QUANT], match_price, msg[MsgCol.OID],
        msg[MsgCol.TIME_S], msg[MsgCol.TIME_NS], msg[MsgCol.TID],
        side_sign=msg[MsgCol.SIDE], is_ask_side=False)

    if cfg.check_book_fill:
        askside = _evict_worst_if_full(askside, is_bid_side=False)

    asks_added = add_order(askside, match_price, qtm_left, msg[MsgCol.OID],
                           msg[MsgCol.TID], msg[MsgCol.TIME_S],
                           msg[MsgCol.TIME_NS])
    if cfg.type_4_interpretation in (cst.Type4.IOC, cst.Type4.MKT):
        asks = jnp.where(msg[MsgCol.TYPE] == 4, askside, asks_added)
    else:
        asks = asks_added
    return asks, bidside, trades


def bid_cancel(cfg, key, msg, askside, bidside, trades):
    return askside, cancel_order(cfg, key, bidside, msg), trades


def ask_cancel(cfg, key, msg, askside, bidside, trades):
    return cancel_order(cfg, key, askside, msg), bidside, trades


def do_nothing(cfg, key, msg, askside, bidside, trades):
    return askside, bidside, trades


# --------------------------------------------------------------------------- #
# Dispatch + scan
# --------------------------------------------------------------------------- #

def _branch_index(msg: jax.Array) -> jax.Array:
    """Branch selection (reference: cond_type_side :587-594). Type-4 messages
    flip side before dispatch (:575)."""
    t = msg[MsgCol.TYPE]
    s = jnp.where(t == 4, -msg[MsgCol.SIDE], msg[MsgCol.SIDE])
    return (((s == -1) & ((t == 1) | (t == 4))) * 0
            + ((s == 1) & ((t == 1) | (t == 4))) * 1
            + ((s == -1) & ((t == 2) | (t == 3))) * 2
            + ((s == 1) & ((t == 2) | (t == 3))) * 3
            + ((s == 0) & (t == 0)) * 4)


def _effective_msg(msg: jax.Array) -> jax.Array:
    """Message with side flipped for type-4, as seen by the handlers."""
    t = msg[MsgCol.TYPE]
    s = jnp.where(t == 4, -msg[MsgCol.SIDE], msg[MsgCol.SIDE])
    return msg.at[MsgCol.SIDE].set(s)


def apply_message(cfg, book_state, key, msg):
    """Process a single (8,) message through the book
    (reference: cond_type_side :555-637)."""
    askside, bidside, trades = book_state
    m = _effective_msg(msg)
    index = _branch_index(msg)
    branches = (
        lambda a, b, t: ask_lim(cfg, m, a, b, t),
        lambda a, b, t: bid_lim(cfg, m, a, b, t),
        lambda a, b, t: ask_cancel(cfg, key, m, a, b, t),
        lambda a, b, t: bid_cancel(cfg, key, m, a, b, t),
        lambda a, b, t: (a, b, t),
    )
    ask, bid, tr = jax.lax.switch(index, branches, askside, bidside, trades)
    return (ask, bid, tr)


def scan_messages(cfg, key, msgs, book_state):
    """Process all messages, returning the final book state only
    (reference: scan_through_entire_array :736-756)."""
    keys = jax.random.split(key, msgs.shape[0])

    def step(state, xs):
        k, m = xs
        return apply_message(cfg, state, k, m), None

    book_state, _ = jax.lax.scan(step, book_state, (keys, msgs))
    return book_state


def scan_messages_save_states(cfg, key, msgs, book_state, n_steps: int):
    """As scan_messages, saving the last ``n_steps`` intermediate book sides
    (reference: scan_through_entire_array_save_states :758-789)."""
    keys = jax.random.split(key, msgs.shape[0])

    def step(state, xs):
        k, m = xs
        new = apply_message(cfg, state, k, m)
        return new, (new[0], new[1])

    last, (all_asks, all_bids) = jax.lax.scan(step, book_state, (keys, msgs))
    return (all_asks[-n_steps:], all_bids[-n_steps:], last[2])


def scan_messages_save_bidask(cfg, key, msgs, book_state, n_steps: int):
    """As scan_messages, saving best bid/ask (price, quantity) after each of
    the last ``n_steps`` messages
    (reference: scan_through_entire_array_save_bidask :791-823)."""
    from .queries import best_bid_ask_incl_quants
    keys = jax.random.split(key, msgs.shape[0])

    def step(state, xs):
        k, m = xs
        new = apply_message(cfg, state, k, m)
        best_ask, best_bid = best_bid_ask_incl_quants(cfg, new[0], new[1])
        return new, (best_ask, best_bid)

    last, (asks_hist, bids_hist) = jax.lax.scan(step, book_state, (keys, msgs))
    return last, (asks_hist[-n_steps:], bids_hist[-n_steps:])


# --------------------------------------------------------------------------- #
# Agent cancel-message generation
# --------------------------------------------------------------------------- #

def get_cancel_msgs(bookside: jax.Array, agent_id, size: int, side,
                    cancel_time, cancel_time_ns) -> jax.Array:
    """Fixed-size array of type-2 cancels for all of a trader's standing
    orders (reference: getCancelMsgs :827-853). A zero pad row is appended so
    a fill index of -1 yields an all-zero (no-op) message."""
    padded = jnp.concatenate(
        [bookside, jnp.zeros((1, 6), dtype=I32)], axis=0)
    match = padded[:, OrderCol.TID] == agent_id
    # jnp.where(size=size, fill_value=-1): first `size` matching indices.
    idx = jnp.where(match, size=size, fill_value=-1)[0]
    rows = padded[idx]
    n = idx.shape[0]
    out = jnp.stack([
        jnp.full((n,), 2, dtype=I32),
        jnp.full((n,), side, dtype=I32),
        rows[:, OrderCol.QUANT],
        rows[:, OrderCol.PRICE],
        rows[:, OrderCol.OID],
        rows[:, OrderCol.TID],
        jnp.full((n,), cancel_time, dtype=I32),
        jnp.full((n,), cancel_time_ns, dtype=I32),
    ], axis=1)
    return out


# --------------------------------------------------------------------------- #
# Trade helpers
# --------------------------------------------------------------------------- #

def create_trade(price, quant, pass_oid, agr_oid, time_s, time_ns,
                 pass_tid, agr_tid) -> jax.Array:
    """(reference: create_trade :892-893)"""
    return jnp.array([price, quant, pass_oid, agr_oid, time_s, time_ns,
                      pass_tid, agr_tid], dtype=I32)


def add_trade(trades: jax.Array, new_trade: jax.Array) -> jax.Array:
    """Append a trade at the first row containing any -1
    (reference: add_trade :885-889 — note it scans the whole row for -1, so a
    real trade with a -1 field can be overwritten; kept for parity)."""
    idx = _first_row_with_neg1(trades)
    return trades.at[idx, :].set(new_trade)
