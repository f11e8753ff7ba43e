"""Sorted-book fast matching engine: O(n) per message.

The exact engine (engine.py) keeps the reference's slot layout and pays an
O(n^2) pairwise priority matrix per message. This engine maintains each book
side **sorted by price-time priority, best first, compacted** (valid rows
form a prefix; empty rows are all -1 sentinels at the tail), which makes
every operation a cheap vector op:

  * matching   = prefix mask + exclusive cumsum  (the crossing orders are by
                 construction the best-priority prefix)
  * trade rows = the filled prefix, rolled into the trade buffer
  * insertion  = position count + shift-right-by-one
  * cancel     = find + subtract + shift-left-by-one on removal
  * best price = row 0

Semantics match engine.py / the reference except for row *placement* (the
reference tie-breaks identical (price, time_s, time_ns) orders by raw slot
index, which depends on slot reuse; this engine is FIFO within equal keys —
SURVEY.md §7 "hard parts" tie-break caveat). Fills, trade totals, best-price
streams, and all order-insensitive queries are identical; equivalence is
asserted against the exact engine in tests/test_engine_sorted.py.

Select with WorldConfig.matching_engine = "sorted" ("exact" is the
default).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import constants as cst
from ..config.constants import MsgCol
from . import engine as ex

I32 = jnp.int32


def _iota(n):
    return jax.lax.broadcasted_iota(I32, (n,), 0)


def _shift_left1(plane, fill_value):
    """out[i] = plane[i+1]; out[n-1] = fill_value."""
    return jnp.concatenate(
        [plane[1:], jnp.full((1,), fill_value, plane.dtype)])


def _shift_right1(plane, fill_value):
    """out[i] = plane[i-1]; out[0] = fill_value."""
    return jnp.concatenate(
        [jnp.full((1,), fill_value, plane.dtype), plane[:-1]])


def _select_row(planes, idx):
    """Row `idx` of SoA planes via one-hot reduction (no gather)."""
    n = planes[0].shape[0]
    sel = _iota(n) == idx
    return tuple(jnp.sum(jnp.where(sel, pl, 0)) for pl in planes)


def _roll_dynamic(plane, shift, n):
    """jnp.roll(plane, shift) for a traced non-negative shift < n, as
    log-step static rolls. XLA:TPU lowers a *dynamic* roll to a serialised
    swap loop (measured 137x slower end-to-end); static rolls are
    slice+concat vector ops, so ceil(log2 n) masked static rolls win."""
    s = 1
    while s < n:
        plane = jnp.where((shift & s) != 0, jnp.roll(plane, s), plane)
        s <<= 1
    return plane


# --------------------------------------------------------------------------- #
# Core sorted-side operations
# --------------------------------------------------------------------------- #

def _match_sorted(nTrades, cap, opp, trades, qtm, price, agr_oid, time_s,
                  time_ns, agr_tid, side_sign, opp_is_ask):
    """Match against the sorted opposing side; crossing orders are a prefix,
    so fills come from an exclusive cumsum (replaces the O(n^2) matrix).

    Like the exact engine, capped trade capture is exact unless one message
    fills more than ``cap`` orders (then the exact engine leaves allocated
    gap slots while this incremental path reuses them — both outside the
    cap contract; cap = nTrades restores full exactness)."""
    p, q, oid, tid, ts, tn = opp
    n = p.shape[0]
    valid = p != -1
    crossing = valid & jnp.where(opp_is_ask, p <= price, p >= price)

    qc = jnp.where(crossing, q, 0)
    from .engine import _cumsum_i32
    cum_excl = _cumsum_i32(qc) - qc
    fill = jnp.where(crossing, jnp.clip(qtm - cum_excl, 0, q), 0).astype(I32)
    qtm_left = (qtm - jnp.sum(fill)).astype(I32)

    filled = fill > 0
    k = jnp.sum(filled).astype(I32)          # fills form the prefix [0, k)

    # ---- trade writes: rows [0,k) land at trade slots [base, base+k) -----
    first_empty = ex._first_true(trades[4] == -1)
    base = jnp.where(first_empty >= 0, first_empty, nTrades - 1)
    t_idx = _iota(nTrades)
    # trade_capture_cap: only the first `cap` fills of a message are
    # recorded, matching engine._finalize_trades (the last-fill overflow
    # slot below stays exact regardless)
    in_range = ((t_idx >= base) & (t_idx < base + jnp.minimum(k, cap))
                & (t_idx < nTrades - 1))
    # reference overflow semantics: the last slot holds the *last* fill when
    # base + k overruns the buffer; otherwise the regular mapping applies
    last_gets = (k > 0) & (base + k - 1 >= nTrades - 1)
    reg_last = (base + k - 1 == nTrades - 1)
    write_last = last_gets | reg_last

    def place(field_n):
        """field over orders (length n) -> trade slots via roll by base."""
        src = field_n[:nTrades] if n >= nTrades else jnp.concatenate(
            [field_n, jnp.zeros((nTrades - n,), field_n.dtype)])
        return _roll_dynamic(src, base, nTrades)

    b = lambda x: jnp.broadcast_to(jnp.asarray(x, I32), p.shape)
    fields = (p, (-side_sign * fill).astype(I32), oid, b(agr_oid), b(time_s),
              b(time_ns), tid, b(agr_tid))
    last_row = _select_row(fields, jnp.maximum(k - 1, 0))

    new_trades = []
    for f, (fld, lr) in enumerate(zip(fields, last_row)):
        placed = place(fld)
        cur = trades[f]
        v = jnp.where(in_range, placed, cur)
        v = jnp.where(write_last & (t_idx == nTrades - 1), lr, v)
        new_trades.append(v.astype(I32))

    # ---- book update: drop the fully-filled prefix, keep sorted ----------
    q2 = (q - fill).astype(I32)
    dead = filled & (q2 <= 0)
    d = jnp.sum(dead).astype(I32)            # dead rows are the prefix [0, d)
    rolled = tuple(_roll_dynamic(pl, n - d, n)
                   for pl in (p, q2, oid, tid, ts, tn))
    n_valid_new = jnp.sum(valid).astype(I32) - d
    keep = _iota(n) < n_valid_new
    neg1 = jnp.full((n,), -1, I32)
    new_opp = tuple(jnp.where(keep, pl, neg1) for pl in rolled)
    return new_opp, qtm_left, tuple(new_trades), k


def _evict_worst_if_full_sorted(own, own_is_bid):
    """Full side: clear every order at the worst price — the tail of the
    sorted side (reference: check_book_fill :395-408)."""
    p = own[0]
    full = jnp.all(p != -1)
    n = p.shape[0]
    worst = p[n - 1]
    clear = full & (p == worst)
    neg1 = jnp.full((n,), -1, I32)
    return tuple(jnp.where(clear, neg1, pl) for pl in own)


def _insert_sorted(own, own_is_bid, price, quant, oid_v, tid_v, ts_v, tn_v):
    """Insert an order at its priority position (FIFO after equal keys)."""
    p, q, oid, tid, ts, tn = own
    n = p.shape[0]
    valid = p != -1
    price_better = jnp.where(own_is_bid, p > price, p < price)
    time_leq = (ts < ts_v) | ((ts == ts_v) & (tn <= tn_v))
    before = valid & (price_better | ((p == price) & time_leq))
    pos = jnp.sum(before).astype(I32)

    idx = _iota(n)
    new_row = (price, quant, oid_v, tid_v, ts_v, tn_v)
    out = []
    for pl, val in zip((p, q, oid, tid, ts, tn), new_row):
        shifted = _shift_right1(pl, -1)
        v = jnp.where(idx < pos, pl, jnp.where(idx == pos,
                                               jnp.asarray(val, I32),
                                               shifted))
        out.append(v.astype(I32))
    return tuple(out)


def _add_order_sorted(own, own_is_bid, price, quant, oid_v, tid_v, ts_v,
                      tn_v):
    quant = jnp.maximum(0, quant)
    inserted = _insert_sorted(own, own_is_bid, price, quant, oid_v, tid_v,
                              ts_v, tn_v)
    skip = quant <= 0
    return tuple(jnp.where(skip, a, b) for a, b in zip(own, inserted))


def _cancel_sorted(cfg, key, own, price, quant, msg_oid):
    """Cancel by oid with init-order / random fallback; row removal keeps the
    side compacted. An unmatched cancel hits the last row (reference .at[-1]
    quirk)."""
    p, q, oid, tid, ts, tn = own
    n = p.shape[0]
    idx = ex._first_true(oid == msg_oid)
    init_m = ((p == price) & (oid <= cfg.init_id)
              & (oid >= cfg.init_id - cfg.book_depth * 2) & (q >= quant))
    idx = jnp.where(idx == -1, ex._first_true(init_m), idx)
    if cfg.cancel_mode in (2, 3):
        def rand_idx(k, require_quant):
            m = p == price
            if require_quant:
                m = m & (q >= quant)
            ids = jnp.where(m, oid, 0)
            k2, _ = jax.random.split(k)
            chosen = jax.random.choice(
                k2, ids, p=jnp.abs(jnp.sign(ids)).astype(jnp.float32))
            return ex._first_true(oid == chosen)
        r = rand_idx(key, True)
        if cfg.cancel_mode == 3:
            inner, _ = jax.random.split(key)
            r = jnp.where(r == -1, rand_idx(inner, False), r)
        idx = jnp.where(idx == -1, r, idx)

    idx_eff = jnp.where(idx < 0, n + idx, idx)
    sel = _iota(n) == idx_eff
    q2 = jnp.where(sel, q - quant, q).astype(I32)
    removed = (q2 <= 0) & sel & (p != -1)
    remove = jnp.any(removed)

    ii = _iota(n)
    out = []
    for pl in (p, q2, oid, tid, ts, tn):
        shifted = _shift_left1(pl, -1)
        v = jnp.where(remove & (ii >= idx_eff), shifted, pl)
        out.append(v.astype(I32))
    # sweep any q<=0 row fully to -1 (reference _removeZeroNegQuant clears
    # whole rows, including the corrupted-sentinel quirk case)
    deadmask = out[1] <= 0
    neg1 = jnp.full((n,), -1, I32)
    return tuple(jnp.where(deadmask, neg1, pl) for pl in out)


# --------------------------------------------------------------------------- #
# Branchless unified message application (sorted variant)
# --------------------------------------------------------------------------- #

def _apply_message_sorted(cfg, state, key, msg):
    """Same dispatch semantics as engine._apply_message_soa, with sorted-side
    kernels. Returns (new_state, fill_count); the uncapped per-message fill
    count feeds the runtime exactness certificate (the capped trade write
    deviates from fully-exact capture iff fill_count > trade_capture_cap —
    engine._overflow_flag semantics)."""
    asks, bids, trades = state
    t = msg[MsgCol.TYPE]
    s_eff = jnp.where(t == 4, -msg[MsgCol.SIDE], msg[MsgCol.SIDE])
    idx = ex._branch_index(t, s_eff)

    is_lim = idx <= 1
    is_cancel = (idx == 2) | (idx == 3)
    active_is_bid = (idx == 1) | (idx == 3)

    own = tuple(jnp.where(active_is_bid, b_, a_)
                for a_, b_ in zip(asks, bids))
    opp = tuple(jnp.where(active_is_bid, a_, b_)
                for a_, b_ in zip(asks, bids))
    opp_is_ask = active_is_bid

    price = msg[MsgCol.PRICE]
    quant = msg[MsgCol.QUANT]

    match_price = price
    if cfg.type_4_interpretation == cst.Type4.MKT:
        match_price = jnp.where(idx == 0, 0, price)

    qtm = jnp.where(is_lim, quant, 0)
    opp_matched, qtm_left, trades_matched, k_fill = _match_sorted(
        cfg.nTrades, ex._trade_cap(cfg), opp, trades, qtm, match_price,
        msg[MsgCol.OID], msg[MsgCol.TIME_S], msg[MsgCol.TIME_NS],
        msg[MsgCol.TID], side_sign=s_eff, opp_is_ask=opp_is_ask)

    own_for_add = own
    if cfg.check_book_fill:
        own_for_add = _evict_worst_if_full_sorted(own, active_is_bid)

    add_price = match_price
    if cfg.type_4_interpretation == cst.Type4.MKT:
        add_price = jnp.where(idx == 1, cfg.maxint, match_price)

    own_added = _add_order_sorted(own_for_add, active_is_bid, add_price,
                                  qtm_left, msg[MsgCol.OID], msg[MsgCol.TID],
                                  msg[MsgCol.TIME_S], msg[MsgCol.TIME_NS])
    if cfg.type_4_interpretation in (cst.Type4.IOC, cst.Type4.MKT):
        suppress = t == 4
        own_after_lim = tuple(jnp.where(suppress, a_, b_)
                              for a_, b_ in zip(own_for_add, own_added))
    else:
        own_after_lim = own_added

    own_cancelled = _cancel_sorted(cfg, key, own, price, quant,
                                   msg[MsgCol.OID])

    new_own = tuple(
        jnp.where(is_cancel, c_, jnp.where(is_lim, l_, o_))
        for c_, l_, o_ in zip(own_cancelled, own_after_lim, own))
    new_opp = tuple(jnp.where(is_lim, m_, o_)
                    for m_, o_ in zip(opp_matched, opp))
    new_trades = tuple(jnp.where(is_lim, m_, t_)
                       for m_, t_ in zip(trades_matched, trades))

    new_asks = tuple(jnp.where(active_is_bid, opp_, own_)
                     for opp_, own_ in zip(new_opp, new_own))
    new_bids = tuple(jnp.where(active_is_bid, own_, opp_)
                     for opp_, own_ in zip(new_opp, new_own))
    return ((new_asks, new_bids, new_trades),
            jnp.where(is_lim, k_fill, 0).astype(I32))


def _best_bid_ask_quants_sorted(cfg, asks, bids):
    """Row 0 is the best order on a sorted side (O(1) best price)."""
    ap, aq = asks[0], asks[1]
    bp, bq = bids[0], bids[1]
    best_ask = ap[0]
    best_bid = bp[0]
    # NOTE an empty side yields volume -nOrders (the -1 sentinels are
    # summed) — reference parity (get_volume_at_price :906-917 applied to
    # best price -1); the env zeroes these in _ffill_best_prices.
    ask_vol = jnp.sum(jnp.where(ap == best_ask, aq, 0))
    bid_vol = jnp.sum(jnp.where(bp == best_bid, bq, 0))
    return (jnp.stack([best_ask, ask_vol]).astype(I32),
            jnp.stack([best_bid, bid_vol]).astype(I32))


# --------------------------------------------------------------------------- #
# Public scan API (signature-compatible with engine.py)
# --------------------------------------------------------------------------- #

def _to_soa(book_state):
    return (ex._side_to_soa(book_state[0]), ex._side_to_soa(book_state[1]),
            ex._trades_to_soa(book_state[2]))


def scan_messages(cfg, key, msgs, book_state):
    keys = jax.random.split(key, msgs.shape[0])
    soa = _to_soa(book_state)

    def step(state, xs):
        k, m = xs
        new, _fills = _apply_message_sorted(cfg, state, k, m)
        return new, None

    (a, b, t), _ = jax.lax.scan(step, soa, (keys, msgs))
    return (ex._side_from_soa(a), ex._side_from_soa(b),
            ex._trades_from_soa(t))


def _scan_bidask_impl(cfg, key, msgs, book_state, n_steps: int):
    keys = jax.random.split(key, msgs.shape[0])
    soa = _to_soa(book_state)

    def step(state, xs):
        k, m = xs
        new, fills = _apply_message_sorted(cfg, state, k, m)
        best_ask, best_bid = _best_bid_ask_quants_sorted(cfg, new[0], new[1])
        return new, (fills, best_ask, best_bid)

    (a, b, t), (fills, asks_hist, bids_hist) = jax.lax.scan(step, soa,
                                                            (keys, msgs))
    last = (ex._side_from_soa(a), ex._side_from_soa(b),
            ex._trades_from_soa(t))
    return last, (asks_hist[-n_steps:], bids_hist[-n_steps:]), fills


def scan_messages_save_bidask(cfg, key, msgs, book_state, n_steps: int):
    last, hist, _ = _scan_bidask_impl(cfg, key, msgs, book_state, n_steps)
    return last, hist


def scan_messages_save_bidask_cert(cfg, key, msgs, book_state, n_steps: int):
    """save_bidask + exactness certificate (engine._overflow_flag
    semantics): the sorted engine's trade write honors trade_capture_cap
    exactly like the exact engine's, so the flag fires iff a message fills
    more than ``cap`` standing orders. (Content-exactness vs the reference
    additionally requires cap = nTrades; slot layout deviates regardless —
    the engine's documented contract.)"""
    last, hist, fills = _scan_bidask_impl(cfg, key, msgs, book_state,
                                          n_steps)
    return last, hist, jnp.any(fills > ex._trade_cap(cfg))


def scan_messages_save_states(cfg, key, msgs, book_state, n_steps: int):
    keys = jax.random.split(key, msgs.shape[0])
    soa = _to_soa(book_state)

    def step(state, xs):
        k, m = xs
        new, _fills = _apply_message_sorted(cfg, state, k, m)
        return new, (new[0], new[1])

    (a, b, t), (asks_h, bids_h) = jax.lax.scan(step, soa, (keys, msgs))
    asks_hist = jnp.stack([x[-n_steps:] for x in asks_h], axis=2)
    bids_hist = jnp.stack([x[-n_steps:] for x in bids_h], axis=2)
    return (asks_hist, bids_hist, ex._trades_from_soa(t))


def apply_message(cfg, book_state, key, msg):
    """Process a single (8,) message (key used directly, as in the exact
    and psort engines' single-message paths)."""
    (a, b, t), _fills = _apply_message_sorted(cfg, _to_soa(book_state), key,
                                              msg.astype(jnp.int32))
    return (ex._side_from_soa(a), ex._side_from_soa(b),
            ex._trades_from_soa(t))


def get_engine(cfg):
    """Backend module for cfg.matching_engine:
    'exact'  — reference slot layout, rank-plane matcher (bit-parity; the
               spec anchor driven directly by the engine-level oracle);
    'psort'  — compacted sorted sides carrying the reference-slot
               permutation: bit-parity at every trade_capture_cap, with
               FULL exactness at the default cap = nTrades at
               cap-independent COST (engine_psort.py) — the preset default;
    'sorted' — compacted sorted sides, O(n)/message (lax), content-equal
               but not slot-layout-equal.

    Unknown names raise (a config typo must not silently select a
    different backend). A Pallas sorted-book kernel existed through round 1
    (ops/book_scan.py) and was retired in round 2: correctness-validated on
    hardware but 1.7x slower than the lax exact engine at production shapes
    (123.5 vs 70.9 ms per 2048x120 messages) with Mosaic ~5x off the VPU
    roofline — the lax+XLA path is the right TPU substrate for this op mix.
    Full record: BASELINE.md "Engine-backend head-to-head"."""
    import sys
    eng = getattr(cfg, "matching_engine", "psort")
    if eng == "sorted":
        return sys.modules[__name__]
    if eng == "psort":
        from . import engine_psort
        return engine_psort
    if eng == "exact":
        return ex
    raise ValueError(
        f"unknown matching_engine {eng!r}; expected one of "
        "{'exact', 'psort', 'sorted'}")


def get_scan_fns(cfg):
    """(scan_messages, scan_messages_save_bidask) for cfg.matching_engine
    (see get_engine)."""
    mod = get_engine(cfg)
    return mod.scan_messages, mod.scan_messages_save_bidask


def get_cert_scan_fn(cfg):
    """scan_messages_save_bidask_cert for cfg.matching_engine: like the
    bidask scan but also returns the per-scan runtime exactness certificate
    (engine._overflow_flag) — True iff a message filled more standing orders
    than trade_capture_cap, i.e. iff the capped trade buffer may deviate
    from fully-exact capture. All three backends compute it from their
    per-message fill counts; it cannot fire at the default cap = nTrades
    while nOrders <= nTrades."""
    return get_engine(cfg).scan_messages_save_bidask_cert
