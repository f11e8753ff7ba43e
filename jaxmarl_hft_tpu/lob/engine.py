"""TPU-native limit-order-book matching engine (functional core).

Parity reference: gymnax_exchange/jaxob/JaxOrderBookArrays.py. Behaviour is
semantically identical (including the reference's edge-case quirks, which are
called out inline), but the *implementation* is redesigned for TPU:

1. **Closed-form O(n) matching, no while-loop, no pairwise matrix.** The
   reference matches an incoming order with a ``lax.while_loop`` that
   repeatedly reduces over the whole book side to find the best order
   (JaxOrderBookArrays.py:284-331). Data-dependent trip counts serialise
   under vmap. Here the filled quantity of each standing order is computed
   in closed form:

       fill_i = clip(q_incoming - S_i, 0, q_i)

   where ``S_i`` is the total quantity of *crossing* standing orders with
   strictly higher price-time priority (priority = (price, time_s, time_ns,
   slot) lexicographic, matching the reference's top-order selection +
   ``jnp.where(size=1)`` first-index tie-break). Because priority order is
   price-primary, crossing orders always occupy the best ranks, so ``S_i``
   is simply the exclusive prefix sum of quantities in rank order. Both the
   rank and that prefix sum (``cumq``) are carried per-slot planes of the
   scan state, maintained incrementally in O(n) per message — no (n, n)
   priority matrix anywhere in the hot path (measured -21%% engine time vs
   the matrix formulation; scripts/probe_sort_vs_matrix.py also rules out
   a sort-based variant). Bit-identical to sequential matching.

2. **Branchless dispatch.** The reference's ``lax.switch`` over five
   type/side handlers computes *every* branch under vmap and then selects.
   Here one unified handler processes limit/cancel/noop with masks and a
   single direction-parameterised matcher — one priority matrix per message
   instead of two, and no five-way select of full book states.

3. **Struct-of-arrays book state in the scan.** Book sides are held as six
   (nOrders,) int32 planes (price/quant/oid/tid/ts/tns) and trades as eight
   (nTrades,) planes inside the message scan, so every per-message op is a
   well-tiled (batch, nOrders) vector op instead of a (batch, nOrders, 6)
   op using 6 of 128 lanes.

4. **Dense one-hot writes, no scatter.** XLA lowers scatters/batched
   dynamic-update-slice to serialised loops on TPU. All book/trade updates
   are expressed as iota-compare selects and masked reductions.

External API keeps the reference's (nOrders, 6) / (nTrades, 8) row-major
arrays; conversion happens once per scan.

Messages are flat (8,) int32 vectors (``MsgCol``).
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


def _cumsum_i32(x):
    """Inclusive integer cumsum as a log-step Hillis-Steele doubling chain.
    jnp.cumsum lowers to an O(n*window) reduce_window on this TPU backend —
    the round-5 profiler trace showed it as the psort scan's single largest
    op (23 us/message at n=100; swapping it bought psort +9.6%). Integer
    addition is associative, so the reassociation is bit-exact."""
    n = x.shape[0]
    s = 1
    while s < n:
        x = x + jnp.concatenate([jnp.zeros((s,), x.dtype), x[:-s]])
        s <<= 1
    return x


def _first_true(mask: jax.Array) -> jax.Array:
    """First index where mask is True; -1 if none (jnp.where(size=1) parity)."""
    idx = jnp.argmax(mask)
    return jnp.where(jnp.any(mask), idx, -1).astype(I32)


def _first_row_with_neg1(arr2d: jax.Array) -> jax.Array:
    """Row index of the first row containing any -1; -1 if none. Matches the
    reference's ``jnp.where(arr == -1, size=1, fill_value=-1)[0]`` row-major
    semantics (add_order :73, add_trade :887)."""
    return _first_true(jnp.any(arr2d == -1, axis=1))


def _onehot_row_set(arr2d: jax.Array, idx, row: jax.Array) -> jax.Array:
    """arr2d.at[idx].set(row) without a scatter; negative idx wraps like
    ``.at`` (the reference leans on .at[-1] writing the last row)."""
    n = arr2d.shape[0]
    idx_eff = jnp.where(idx < 0, n + idx, idx)
    sel = (jax.lax.broadcasted_iota(I32, (n,), 0) == idx_eff)
    return jnp.where(sel[:, None], row[None, :], arr2d)


# --------------------------------------------------------------------------- #
# Struct-of-arrays conversion (internal hot-path layout)
# --------------------------------------------------------------------------- #

def _side_to_soa(side: jax.Array):
    """(n, 6) row-major -> 6 planes of (n,)."""
    return tuple(side[:, i] for i in range(6))


def _side_from_soa(soa) -> jax.Array:
    return jnp.stack(soa, axis=1)


def _trades_to_soa(trades: jax.Array):
    return tuple(trades[:, i] for i in range(8))


def _trades_from_soa(soa) -> jax.Array:
    return jnp.stack(soa, axis=1)


# --------------------------------------------------------------------------- #
# Core SoA kernels
# --------------------------------------------------------------------------- #

def _compute_rank(side_soa, side_is_bid):
    """Priority rank of every slot: 0 = best. Empty slots get rank n. Rank
    order is (price, time_s, time_ns, slot) lexicographic — identical to the
    pairwise priority matrix, so rank_j < rank_i  <=>  better[j, i].
    Computed once per scan (lexsort) and maintained incrementally."""
    p, q, oid, tid, ts, tn = side_soa
    n = p.shape[0]
    valid = p != -1
    big = jnp.iinfo(jnp.int32).max
    key_p = jnp.where(valid, jnp.where(side_is_bid, -p, p), big)
    key_ts = jnp.where(valid, ts, big)
    key_tn = jnp.where(valid, tn, big)
    order = jnp.lexsort((key_tn, key_ts, key_p))
    inv = jnp.argsort(order).astype(I32)
    return jnp.where(valid, inv, n)


def _match_soa(cap, opp, opp_rank, opp_cumq, qtm, price, opp_is_ask,
               slot_planes=False):
    """Match ``qtm`` at limit ``price`` against the opposing SoA side;
    returns (new_opp, new_opp_rank, new_opp_cumq, qtm_left, fills,
    last_fill, k).

    Replaces the reference while-loop (:284-331) with the closed-form prefix
    fill. Because rank order is price-primary, crossing orders occupy the
    best (lowest) ranks, fills form a rank prefix [0, k), and an order's
    rank IS its fill order. The higher-priority crossing quantity S_i is
    therefore just the exclusive prefix-sum of quantities in rank order —
    carried incrementally as the ``cumq`` plane (see _apply_message_soa), so
    no (n, n) priority matrix is ever built in the scan:

        fill_i  = crossing_i ? clip(qtm - cumq_i, 0, q_i) : 0
        cumq'_i = max(cumq_i - total_fill, 0)   (greedy prefix consumption)

    Trade rows are not written here: the first ``cap`` fills are extracted in
    fill order as compressed (cap,)-vectors (price, quantity, passive oid,
    passive tid) and assembled into the trade buffer once per scan by
    ``_finalize_trades`` — turning the per-message (nTrades, n) write matrix
    into a (cap, n) one."""
    p, q, oid, tid, ts, tn = opp
    n = p.shape[0]
    valid = p != -1
    crossing = valid & jnp.where(opp_is_ask, p <= price, p >= price)

    fill = jnp.where(crossing, jnp.clip(qtm - opp_cumq, 0, q), 0).astype(I32)
    total_fill = jnp.sum(fill).astype(I32)
    qtm_left = (qtm - total_fill).astype(I32)

    filled = fill > 0
    k = jnp.sum(filled).astype(I32)

    if slot_planes:
        # per-slot planes (the inscan write consumes them directly;
        # fill order c  <=>  rank == c)
        fills = (fill, jnp.where(filled, opp_rank, n).astype(I32))
    else:
        # compressed fills: fill order c < cap  <=>  rank == c
        c_iota = jax.lax.broadcasted_iota(I32, (cap, n), 0)
        MC = filled[None, :] & (opp_rank[None, :] == c_iota)

        def cfield(vals):
            return jnp.sum(jnp.where(MC, vals[None, :], 0),
                           axis=1).astype(I32)

        fills = (cfield(p), cfield(fill), cfield(oid), cfield(tid))

    # the message's LAST fill (rank k-1), recorded separately so the
    # buffer-overflow "last write wins" slot is exact even when k > cap
    last_sel = filled & (opp_rank == k - 1)

    def lfield(vals):
        return jnp.sum(jnp.where(last_sel, vals, 0)).astype(I32)

    last_fill = (lfield(p), lfield(fill), lfield(oid), lfield(tid))

    # book + rank + cumq update (fully-filled rows are the rank prefix
    # [0, d); rank compaction does not change survivors' prefix sums)
    new_q = (q - fill).astype(I32)
    dead = new_q <= 0
    d = jnp.sum(dead & valid).astype(I32)
    neg1 = jnp.full_like(p, -1)
    new_opp = tuple(jnp.where(dead, neg1, x) for x in
                    (p, new_q, oid, tid, ts, tn))
    survivor = valid & ~dead
    new_rank = jnp.where(survivor, opp_rank - d, n).astype(I32)
    new_cumq = jnp.where(survivor,
                         jnp.maximum(opp_cumq - total_fill, 0), 0).astype(I32)
    return new_opp, new_rank, new_cumq, qtm_left, fills, last_fill, k


def _finalize_trades(cfg, init_trades, recs):
    """Assemble the trade buffer from per-message compressed fill records,
    replicating the reference's sequential append semantics: rows land from
    the first empty slot onward in global fill order; once the buffer is
    full, later fills overwrite the last slot (last one wins)
    (reference: match_order :205-217 empty-slot search + .at[-1] wrap).

    recs: (P, Q, POID, PTID) each (M, cap); LP/LQ/LOID/LTID per-message
    last-fill scalars; K (M,); AOID/TS/TN/ATID (M,) scalars. Exact whenever
    no single message fills more than ``cap`` orders (the overflow slot is
    always exact via the last-fill record) and the initial buffer is
    prefix-packed (always true in the env, which reinitialises trades each
    step)."""
    P, Q, POID, PTID, LP, LQ, LOID, LTID, K, AOID, TS, TN, ATID = recs
    nT = cfg.nTrades
    M, cap = P.shape

    first_empty = _first_true(init_trades[4] == -1)
    base0 = jnp.where(first_empty >= 0, first_empty, nT - 1)
    cum = base0 + _cumsum_i32(K) - K                       # (M,) start slots

    t = jax.lax.broadcasted_iota(I32, (nT,), 0)
    W = (cum[None, :] <= t[:, None]) & (t[:, None] < (cum + K)[None, :])
    valid_t = jnp.any(W, axis=1)
    cum_at = jnp.sum(jnp.where(W, cum[None, :], 0), axis=1)
    r = t - cum_at                                        # fill idx in msg
    recorded = r < cap
    R = r[:, None] == jax.lax.broadcasted_iota(I32, (nT, cap), 1)

    def per_order(F):
        G = jnp.sum(jnp.where(W[:, :, None], F[None, :, :], 0), axis=1)
        return jnp.sum(jnp.where(R, G, 0), axis=1).astype(I32)

    def per_msg(Svec):
        return jnp.sum(jnp.where(W, Svec[None, :], 0), axis=1).astype(I32)

    hit = valid_t & recorded & (t < nT - 1)
    vals = (per_order(P), per_order(Q), per_order(POID), per_msg(AOID),
            per_msg(TS), per_msg(TN), per_order(PTID), per_msg(ATID))
    out = tuple(jnp.where(hit, v, cur)
                for v, cur in zip(vals, init_trades))

    return _apply_overflow_last(nT, out, base0, K,
                                (LP, LQ, LOID, AOID, TS, TN, LTID, ATID), t)


def _apply_overflow_last(nT, out, base0, K, last_fields, t):
    """Overflow / boundary: slot nT-1 holds the globally-last fill (reference
    match_order :205-217 .at[-1] wrap). ``last_fields`` are (M,) per-message
    last-fill columns in trade-row order."""
    totK = jnp.sum(K)
    write_last = (totK > 0) & (base0 + totK - 1 >= nT - 1)
    M = K.shape[0]
    m_iota = jax.lax.broadcasted_iota(I32, (M,), 0)
    m_l = jnp.max(jnp.where(K > 0, m_iota, -1))
    sel_m = m_iota == m_l

    def last_msg(Svec):
        return jnp.sum(jnp.where(sel_m, Svec, 0)).astype(I32)

    return tuple(jnp.where(write_last & (t == nT - 1), last_msg(lf), o)
                 for lf, o in zip(last_fields, out))


def _finalize(cfg, init_trades, recs):
    return _finalize_trades(cfg, init_trades, recs)


def _write_trades_inscan(cfg, tstate, fill, rank, opp_p, opp_oid, opp_tid,
                         k, last_fill, s_eff, msg_idx):
    """Direct in-scan trade-buffer write (trade_capture_mode="inscan"):
    this message's fills land at slots [base, base+min(k, cap)) via a
    single (nTrades, nOrders) rank-offset one-hot compare; the buffer is
    carried through the scan, so there are no per-message records and no
    finalize pass.

    The carry is reduced to the 4 *passive* columns plus a writer-message
    index plane (P, Q, POID, PTID, MIDX) — the 4 aggressor columns are
    per-message scalars reconstructed once per scan from MIDX by
    _scan_trades, which trims 3/8 of the carried trade state's HBM
    traffic. Occupancy is MIDX != -1 (-2 marks rows occupied before the
    scan), matching the compressed path's trades[time_s] == -1 probe.

    Bit-identical to the compressed assembly whenever cap covers
    every message's fill count — in particular always at cap = nTrades.
    When a message overflows a smaller cap, the compressed path leaves
    allocated gap slots while this incremental path reuses them (the same
    documented caveat as engine_sorted._match_sorted; both are outside the
    cap contract). Reference semantics: match_order :205-217 sequential
    append + .at[-1] overflow wrap."""
    P, Q, POID, PTID, MIDX = tstate
    nT = cfg.nTrades
    cap = _trade_cap(cfg)
    first_empty = _first_true(MIDX == -1)
    base = jnp.where(first_empty >= 0, first_empty, nT - 1)
    t_idx = jax.lax.broadcasted_iota(I32, (nT,), 0)
    filled = fill > 0
    # slots [base, base+min(k, cap)) are written, slot base+r by the fill
    # of rank r; one fused compare instead of mask & rank-window & any
    combined = jnp.where(filled & (rank < cap), base + rank, -1)
    MASK = combined[None, :] == t_idx[:, None]
    row_has = ((t_idx >= base) & (t_idx < base + jnp.minimum(k, cap))
               & (t_idx < nT - 1))

    def pick(v):
        return jnp.sum(jnp.where(MASK, v[None, :], 0), axis=1).astype(I32)

    newP = jnp.where(row_has, pick(opp_p), P)
    newQ = jnp.where(row_has, (-s_eff * pick(fill)).astype(I32), Q)
    newPOID = jnp.where(row_has, pick(opp_oid), POID)
    newPTID = jnp.where(row_has, pick(opp_tid), PTID)
    newM = jnp.where(row_has, msg_idx, MIDX)

    lp, lq, loid, ltid = last_fill
    wl = ((k > 0) & (base + k - 1 >= nT - 1)) & (t_idx == nT - 1)
    return (jnp.where(wl, lp, newP).astype(I32),
            jnp.where(wl, (-s_eff * lq), newQ).astype(I32),
            jnp.where(wl, loid, newPOID).astype(I32),
            jnp.where(wl, ltid, newPTID).astype(I32),
            jnp.where(wl, msg_idx, newM).astype(I32))


def _add_order_soa(own, own_rank, own_cumq, own_is_bid, price, quant, oid_v,
                   tid_v, ts_v, tn_v):
    """Insert at the first row containing any -1 (reference add_order :62-83
    scans the whole (n,6) row for -1), sweep q <= 0 rows, and maintain the
    priority-rank and prefix-quantity (cumq) planes. Handles the full-book
    overwrite quirk (no empty row -> .at[-1] clobbers the last slot's
    order)."""
    p, q, oid, tid, ts, tn = own
    n = p.shape[0]
    any_neg1 = ((p == -1) | (q == -1) | (oid == -1) | (tid == -1)
                | (ts == -1) | (tn == -1))
    idx = _first_true(any_neg1)
    idx_eff = jnp.where(idx < 0, n + idx, idx)
    iota = jax.lax.broadcasted_iota(I32, (n,), 0)
    sel = iota == idx_eff
    quant = jnp.maximum(0, quant)

    # bookkeeping 1: the written slot may clobber a valid order — ranks above
    # it compact by one and its quantity leaves the prefix sums
    was_valid_e = jnp.any(sel & (p != -1))
    old_rank_e = jnp.sum(jnp.where(sel, own_rank, 0))
    q_e = jnp.sum(jnp.where(sel, q, 0))
    others_valid = (p != -1) & ~sel
    rank_rm = jnp.where(
        sel, n,
        jnp.where(others_valid & was_valid_e & (own_rank > old_rank_e),
                  own_rank - 1, own_rank))
    cumq_rm = jnp.where(others_valid & was_valid_e & (own_rank > old_rank_e),
                        own_cumq - q_e, own_cumq)

    # bookkeeping 2: insertion position of the new order. Tie-break on
    # equal (price, ts, tns) is the raw slot index, matching the reference's
    # jnp.where(size=1) first-index semantics.
    alive = quant > 0
    price_better = jnp.where(own_is_bid, p > price, p < price)
    time_better_or_tie = (ts < ts_v) | ((ts == ts_v) & (
        (tn < tn_v) | ((tn == tn_v) & (iota < idx_eff))))
    before = others_valid & (price_better
                             | ((p == price) & time_better_or_tie))
    pos = jnp.sum(before).astype(I32)
    rank_ins = jnp.where(others_valid & (rank_rm >= pos), rank_rm + 1,
                         rank_rm)
    rank_ins = jnp.where(sel, pos, rank_ins)
    new_rank = jnp.where(alive, rank_ins, rank_rm).astype(I32)
    # prefix sums: orders at/after pos gain the new quantity; the new order's
    # prefix is the total quantity ranked before it
    cumq_ins = jnp.where(others_valid & (rank_rm >= pos), cumq_rm + quant,
                         cumq_rm)
    cumq_sel = jnp.sum(jnp.where(before, q, 0)).astype(I32)
    cumq_ins = jnp.where(sel, cumq_sel, cumq_ins)
    new_cumq = jnp.where(alive, cumq_ins, jnp.where(sel, 0, cumq_rm))

    p2 = jnp.where(sel, price, p).astype(I32)
    q2 = jnp.where(sel, quant, q).astype(I32)
    oid2 = jnp.where(sel, oid_v, oid).astype(I32)
    tid2 = jnp.where(sel, tid_v, tid).astype(I32)
    ts2 = jnp.where(sel, ts_v, ts).astype(I32)
    tn2 = jnp.where(sel, tn_v, tn).astype(I32)
    dead = q2 <= 0
    neg1 = jnp.full_like(p, -1)
    planes = tuple(jnp.where(dead, neg1, x)
                   for x in (p2, q2, oid2, tid2, ts2, tn2))
    new_rank = jnp.where(dead, n, new_rank)
    new_cumq = jnp.where(dead, 0, new_cumq).astype(I32)
    return planes, new_rank, new_cumq


def _evict_worst_if_full_soa(own, own_rank, own_cumq, own_is_bid):
    """If the side is full, clear every order at the worst price
    (reference: check_book_fill blocks :395-408, :484-497). Runs before every
    limit-order add, even zero-quantity ones, matching the reference.
    Evicted orders hold the worst (densely trailing) ranks, so survivor
    ranks and prefix sums are unchanged."""
    p = own[0]
    n = p.shape[0]
    full = jnp.all(p >= 0)
    worst = jnp.where(own_is_bid, jnp.min(p), jnp.max(p))
    clear = full & (p == worst)
    neg1 = jnp.full_like(p, -1)
    planes = tuple(jnp.where(clear, neg1, x) for x in own)
    new_rank = jnp.where(clear, n, own_rank)
    new_cumq = jnp.where(clear, 0, own_cumq)
    return planes, new_rank, new_cumq


def _cancel_idx_soa(cfg, key, own, price, quant, msg_oid):
    """Slot to cancel: oid match, then init-order fallback, then (modes 2/3)
    random fallback (reference: cancel_order :93-117 + get_init_id_match
    :120-139 + get_random_id_match :141-164)."""
    p, q, oid, tid, ts, tn = own
    idx = _first_true(oid == msg_oid)
    init_m = ((p == price) & (oid <= cfg.init_id)
              & (oid >= cfg.init_id - cfg.book_depth * 2) & (q >= quant))
    idx = jnp.where(idx == -1, _first_true(init_m), idx)
    if cfg.cancel_mode in (2, 3):
        def rand_idx(k, require_quant):
            m = p == price
            if require_quant:
                m = m & (q >= quant)
            ids = jnp.where(m, oid, 0)
            k2, _ = jax.random.split(k)
            chosen = jax.random.choice(
                k2, ids, p=jnp.abs(jnp.sign(ids)).astype(jnp.float32))
            return _first_true(oid == chosen)
        r = rand_idx(key, True)
        if cfg.cancel_mode == 3:
            inner, _ = jax.random.split(key)
            r = jnp.where(r == -1, rand_idx(inner, False), r)
        idx = jnp.where(idx == -1, r, idx)
    return idx


def _cancel_soa(cfg, key, own, own_rank, own_cumq, price, quant, msg_oid):
    """Subtract quantity at the matched slot; an unmatched cancel hits the
    last row (.at[-1] reference quirk), then sweep q <= 0. Rank plane is
    compacted and the removed quantity leaves the prefix sums of
    lower-priority orders."""
    p, q, oid, tid, ts, tn = own
    idx = _cancel_idx_soa(cfg, key, own, price, quant, msg_oid)
    n = p.shape[0]
    idx_eff = jnp.where(idx < 0, n + idx, idx)
    sel = jax.lax.broadcasted_iota(I32, (n,), 0) == idx_eff
    q2 = jnp.where(sel, q - quant, q).astype(I32)

    was_valid_e = jnp.any(sel & (p != -1))
    removed = was_valid_e & jnp.any(sel & (q2 <= 0))
    r_e = jnp.sum(jnp.where(sel, own_rank, 0))
    # book-quantity delta at the cancelled slot: the whole remaining quantity
    # if the row dies, else the subtracted amount
    q_e = jnp.sum(jnp.where(sel, q, 0))
    q2_e = jnp.sum(jnp.where(sel, q2, 0))
    dq = jnp.where(was_valid_e, q_e - jnp.maximum(q2_e, 0), 0)
    others_valid = (p != -1) & ~sel
    new_rank = jnp.where(
        sel & removed, n,
        jnp.where(others_valid & removed & (own_rank > r_e), own_rank - 1,
                  own_rank)).astype(I32)
    new_cumq = jnp.where(others_valid & was_valid_e & (own_rank > r_e),
                         own_cumq - dq, own_cumq)
    new_cumq = jnp.where(sel & removed, 0, new_cumq).astype(I32)

    dead = q2 <= 0
    neg1 = jnp.full_like(p, -1)
    planes = tuple(jnp.where(dead, neg1, x)
                   for x in (p, q2, oid, tid, ts, tn))
    new_rank = jnp.where(dead, n, new_rank)
    new_cumq = jnp.where(dead, 0, new_cumq)
    return planes, new_rank, new_cumq


# --------------------------------------------------------------------------- #
# Branchless unified message application
# --------------------------------------------------------------------------- #

def _branch_index(t, s_eff):
    """Branch selection formula (reference: cond_type_side :587-594),
    computed on the type and the (type-4-flipped) side."""
    return (((s_eff == -1) & ((t == 1) | (t == 4))) * 0
            + ((s_eff == 1) & ((t == 1) | (t == 4))) * 1
            + ((s_eff == -1) & ((t == 2) | (t == 3))) * 2
            + ((s_eff == 1) & ((t == 2) | (t == 3))) * 3
            + ((s_eff == 0) & (t == 0)) * 4)


def _unroll(cfg):
    u = getattr(cfg, "scan_unroll", 1)
    return u if u and u > 1 else 1


def _trade_cap(cfg):
    cap = getattr(cfg, "trade_capture_cap", 0)
    return cap if cap and cap > 0 else cfg.nTrades


def _trade_mode(cfg):
    """Trade-buffer assembly strategy. "auto" picks the measured-fastest
    bit-equal strategy for the cap (BASELINE.md round-2 ladder): compressed
    records when the cap bounds the extraction matrix, the carried in-scan
    write at full exactness (2x compressed there)."""
    m = getattr(cfg, "trade_capture_mode", "auto")
    if m == "auto":
        return ("compressed" if _trade_cap(cfg) < cfg.nTrades else "inscan")
    if m not in ("compressed", "inscan"):
        raise ValueError(
            f"unknown trade_capture_mode {m!r}; expected one of "
            "{'auto', 'compressed', 'inscan'} (the 'postscan' lab path was "
            "removed in round 3 - BASELINE.md records the negative result)")
    return m


# Position of the per-message fill count k in compressed-mode fill_rec
# tuples (built in _apply_message_soa, read by _overflow_flag). Kept as a
# named module-level constant so a reorder of the record tuple cannot
# silently point the exactness certificate at the wrong column.
COMPRESSED_FILLCOUNT_IDX = 8


def _apply_message_soa(cfg, state, key, msg, msg_idx=0):
    """Process one (8,) message against the SoA book state (+ rank and
    prefix-quantity planes). Equivalent to the reference's lax.switch over
    {ask_lim, bid_lim, ask_cancel, bid_cancel, noop} (:555-637) but
    branchless: every path is computed on masked data and merged with
    selects — a single matcher invocation per message. Returns (new_state,
    fill_record); trade-buffer assembly happens once per scan in
    _finalize_trades — except in "inscan" mode, where the trade SoA rides
    in the carry and is written directly per message."""
    mode = _trade_mode(cfg)
    inscan = mode == "inscan"
    if inscan:
        asks, bids, rank_a, rank_b, cumq_a, cumq_b, trades_soa = state
    else:
        asks, bids, rank_a, rank_b, cumq_a, cumq_b = state
    t = msg[MsgCol.TYPE]
    s_eff = jnp.where(t == 4, -msg[MsgCol.SIDE], msg[MsgCol.SIDE])
    idx = _branch_index(t, s_eff)

    is_lim = idx <= 1               # {ask_lim, bid_lim} incl. the reference's
    #                                 degenerate fallthrough (index 0)
    is_cancel = (idx == 2) | (idx == 3)
    active_is_bid = (idx == 1) | (idx == 3)   # own side is the bid side

    own = tuple(jnp.where(active_is_bid, b_, a_)
                for a_, b_ in zip(asks, bids))
    opp = tuple(jnp.where(active_is_bid, a_, b_)
                for a_, b_ in zip(asks, bids))
    own_rank = jnp.where(active_is_bid, rank_b, rank_a)
    opp_rank = jnp.where(active_is_bid, rank_a, rank_b)
    own_cumq = jnp.where(active_is_bid, cumq_b, cumq_a)
    opp_cumq = jnp.where(active_is_bid, cumq_a, cumq_b)
    # For limits: own side receives the remainder, opp side is matched.
    # opp is the ask side exactly when the incoming order is a bid.
    opp_is_ask = active_is_bid

    price = msg[MsgCol.PRICE]
    quant = msg[MsgCol.QUANT]

    # --- limit path -------------------------------------------------------
    match_price = price
    if cfg.type_4_interpretation == cst.Type4.MKT:
        # reference quirk: ask_lim forces price 0 *before* matching (:471),
        # bid_lim forces maxint only for the add, *after* matching (:391)
        match_price = jnp.where(idx == 0, 0, price)

    qtm = jnp.where(is_lim, quant, 0)
    (opp_matched, opp_rank_matched, opp_cumq_matched, qtm_left, fills,
     last_fill, k) = _match_soa(_trade_cap(cfg), opp, opp_rank, opp_cumq,
                                qtm, match_price, opp_is_ask=opp_is_ask,
                                slot_planes=inscan)
    if inscan:
        # write this message's fills straight into the carried trade planes;
        # no per-message record leaves the scan
        new_trades_soa = _write_trades_inscan(
            cfg, trades_soa, fills[0], fills[1], opp[0], opp[2], opp[3], k,
            last_fill, s_eff, jnp.asarray(msg_idx, I32))
        # fill count only: feeds the runtime exactness certificate
        # (_overflow_flag); the trade buffer itself rides the carry
        fill_rec = (k,)
    else:
        # NOTE: the per-message fill count k must sit at
        # COMPRESSED_FILLCOUNT_IDX — _overflow_flag reads it positionally.
        fill_rec = (fills[0], (-s_eff * fills[1]).astype(I32), fills[2],
                    fills[3], last_fill[0],
                    (-s_eff * last_fill[1]).astype(I32),
                    last_fill[2], last_fill[3], k, msg[MsgCol.OID],
                    msg[MsgCol.TIME_S], msg[MsgCol.TIME_NS], msg[MsgCol.TID])

    own_for_add, own_rank_for_add, own_cumq_for_add = (own, own_rank,
                                                       own_cumq)
    if cfg.check_book_fill:
        own_for_add, own_rank_for_add, own_cumq_for_add = \
            _evict_worst_if_full_soa(own, own_rank, own_cumq, active_is_bid)

    add_price = match_price
    if cfg.type_4_interpretation == cst.Type4.MKT:
        add_price = jnp.where(idx == 1, cfg.maxint, match_price)

    own_added, own_rank_added, own_cumq_added = _add_order_soa(
        own_for_add, own_rank_for_add, own_cumq_for_add, active_is_bid,
        add_price, qtm_left, msg[MsgCol.OID], msg[MsgCol.TID],
        msg[MsgCol.TIME_S], msg[MsgCol.TIME_NS])
    if cfg.type_4_interpretation in (cst.Type4.IOC, cst.Type4.MKT):
        # type-4 remainder is not added; the evicted-but-not-added book is
        # kept (reference :418)
        suppress = t == 4
        own_after_lim = tuple(jnp.where(suppress, a_, b_)
                              for a_, b_ in zip(own_for_add, own_added))
        own_rank_after_lim = jnp.where(suppress, own_rank_for_add,
                                       own_rank_added)
        own_cumq_after_lim = jnp.where(suppress, own_cumq_for_add,
                                       own_cumq_added)
    else:
        own_after_lim = own_added
        own_rank_after_lim = own_rank_added
        own_cumq_after_lim = own_cumq_added

    # --- cancel path ------------------------------------------------------
    own_cancelled, own_rank_cancelled, own_cumq_cancelled = _cancel_soa(
        cfg, key, own, own_rank, own_cumq, price, quant, msg[MsgCol.OID])

    # --- merge ------------------------------------------------------------
    new_own = tuple(
        jnp.where(is_cancel, c_, jnp.where(is_lim, l_, o_))
        for c_, l_, o_ in zip(own_cancelled, own_after_lim, own))
    new_own_rank = jnp.where(is_cancel, own_rank_cancelled,
                             jnp.where(is_lim, own_rank_after_lim, own_rank))
    new_own_cumq = jnp.where(is_cancel, own_cumq_cancelled,
                             jnp.where(is_lim, own_cumq_after_lim, own_cumq))
    new_opp = tuple(jnp.where(is_lim, m_, o_)
                    for m_, o_ in zip(opp_matched, opp))
    new_opp_rank = jnp.where(is_lim, opp_rank_matched, opp_rank)
    new_opp_cumq = jnp.where(is_lim, opp_cumq_matched, opp_cumq)

    new_asks = tuple(jnp.where(active_is_bid, opp_, own_)
                     for opp_, own_ in zip(new_opp, new_own))
    new_bids = tuple(jnp.where(active_is_bid, own_, opp_)
                     for opp_, own_ in zip(new_opp, new_own))
    new_rank_a = jnp.where(active_is_bid, new_opp_rank, new_own_rank)
    new_rank_b = jnp.where(active_is_bid, new_own_rank, new_opp_rank)
    new_cumq_a = jnp.where(active_is_bid, new_opp_cumq, new_own_cumq)
    new_cumq_b = jnp.where(active_is_bid, new_own_cumq, new_opp_cumq)
    if inscan:
        return (new_asks, new_bids, new_rank_a, new_rank_b, new_cumq_a,
                new_cumq_b, new_trades_soa), fill_rec
    return (new_asks, new_bids, new_rank_a, new_rank_b, new_cumq_a,
            new_cumq_b), fill_rec


def _best_bid_ask_quants_soa(cfg, asks, bids):
    """Best (price, volume) per side in SoA form (reference :967-984)."""
    ap, aq = asks[0], asks[1]
    bp, bq = bids[0], bids[1]
    best_ask = jnp.min(jnp.where(ap == -1, cfg.maxint, ap))
    best_ask = jnp.where(best_ask == cfg.maxint, -1, best_ask)
    best_bid = jnp.max(bp)
    ask_vol = jnp.sum(jnp.where(ap == best_ask, aq, 0))
    bid_vol = jnp.sum(jnp.where(bp == best_bid, bq, 0))
    return (jnp.stack([best_ask, ask_vol]).astype(I32),
            jnp.stack([best_bid, bid_vol]).astype(I32))


# --------------------------------------------------------------------------- #
# Public row-major operations (API-compatible with the reference)
# --------------------------------------------------------------------------- #

def add_order(side: jax.Array, price, quant, oid, tid, time_s, time_ns
              ) -> jax.Array:
    """Insert an order into the first empty slot (reference: add_order
    :62-83)."""
    idx = _first_row_with_neg1(side)
    row = jnp.stack([jnp.asarray(price, I32),
                     jnp.maximum(0, jnp.asarray(quant, I32)),
                     jnp.asarray(oid, I32), jnp.asarray(tid, I32),
                     jnp.asarray(time_s, I32), jnp.asarray(time_ns, I32)])
    side = _onehot_row_set(side, idx, row)
    return _remove_zero_neg_quant(side)


def cancel_order(cfg, key, side: jax.Array, msg: jax.Array) -> jax.Array:
    """Remove quantity by order id with init-order / random fallbacks
    (reference: cancel_order :93-117)."""
    soa = _side_to_soa(side)
    rank = _compute_rank(soa, side_is_bid=True)  # rank unused for output
    cumq = _compute_cumq(soa, rank)
    planes, _, _ = _cancel_soa(cfg, key, soa, rank, cumq, msg[MsgCol.PRICE],
                               msg[MsgCol.QUANT], msg[MsgCol.OID])
    return _side_from_soa(planes)


def _compute_cumq(side_soa, rank):
    """Exclusive prefix sum of quantities in rank order, per slot; 0 on
    invalid slots. O(n^2) — used once per scan to seed the carried plane."""
    p, q = side_soa[0], side_soa[1]
    n = p.shape[0]
    valid = p != -1
    contrib = (valid[:, None] & (rank[:, None] < rank[None, :]))
    cumq = jnp.sum(jnp.where(contrib, q[:, None], 0), axis=0).astype(I32)
    return jnp.where(valid, cumq, 0)


def _init_soa_state(book_state):
    asks = _side_to_soa(book_state[0])
    bids = _side_to_soa(book_state[1])
    rank_a = _compute_rank(asks, side_is_bid=False)
    rank_b = _compute_rank(bids, side_is_bid=True)
    cumq_a = _compute_cumq(asks, rank_a)
    cumq_b = _compute_cumq(bids, rank_b)
    return (asks, bids, rank_a, rank_b, cumq_a, cumq_b)


def _scan_init(cfg, book_state):
    soa = _init_soa_state(book_state)
    if _trade_mode(cfg) == "inscan":
        tr = _trades_to_soa(book_state[2])
        midx = jnp.where(tr[4] == -1, -1, -2).astype(I32)
        soa = soa + ((tr[0], tr[1], tr[2], tr[6], midx),)
    return soa


def _scan_trades(cfg, final_state, init_trades_rows, recs, msgs):
    """Final trade planes for a scan: carried planes + aggressor-column
    reconstruction (inscan) or record assembly (compressed)."""
    if _trade_mode(cfg) != "inscan":
        return _finalize(cfg, _trades_to_soa(init_trades_rows), recs)
    P, Q, POID, PTID, MIDX = final_state[6]
    init = _trades_to_soa(init_trades_rows)
    nT = P.shape[0]
    M = msgs.shape[0]
    # aggressor columns of written rows come from the writing message
    W = MIDX[:, None] == jax.lax.broadcasted_iota(I32, (nT, M), 1)

    def ag(col):
        return jnp.sum(jnp.where(W, msgs[None, :, col], 0),
                       axis=1).astype(I32)

    written = MIDX >= 0

    def mix(w_v, init_v):
        return jnp.where(written, w_v, init_v).astype(I32)

    return (mix(P, init[0]), mix(Q, init[1]), mix(POID, init[2]),
            mix(ag(MsgCol.OID), init[3]), mix(ag(MsgCol.TIME_S), init[4]),
            mix(ag(MsgCol.TIME_NS), init[5]), mix(PTID, init[6]),
            mix(ag(MsgCol.TID), init[7]))


def apply_message(cfg, book_state, key, msg):
    """Process a single (8,) message through a row-major book state
    (reference: cond_type_side :555-637)."""
    state, rec = _apply_message_soa(cfg, _scan_init(cfg, book_state), key,
                                    msg)
    recs = jax.tree.map(lambda x: x[None], rec)
    trades = _scan_trades(cfg, state, book_state[2], recs, msg[None])
    a, b = state[0], state[1]
    return (_side_from_soa(a), _side_from_soa(b), _trades_from_soa(trades))


def scan_messages(cfg, key, msgs, book_state):
    """Process all messages, returning the final book state only
    (reference: scan_through_entire_array :736-756)."""
    keys = jax.random.split(key, msgs.shape[0])
    soa = _scan_init(cfg, book_state)

    def step(state, xs):
        k, m, i = xs
        return _apply_message_soa(cfg, state, k, m, i)

    idxs = jnp.arange(msgs.shape[0], dtype=I32)
    final, recs = jax.lax.scan(step, soa, (keys, msgs, idxs),
                               unroll=_unroll(cfg))
    a, b = final[0], final[1]
    trades = _scan_trades(cfg, final, book_state[2], recs, msgs)
    return (_side_from_soa(a), _side_from_soa(b), _trades_from_soa(trades))


def scan_messages_save_states(cfg, key, msgs, book_state, n_steps: int):
    """As scan_messages, saving the last ``n_steps`` intermediate book sides
    (reference: scan_through_entire_array_save_states :758-789)."""
    keys = jax.random.split(key, msgs.shape[0])
    soa = _scan_init(cfg, book_state)

    def step(state, xs):
        k, m, i = xs
        new, rec = _apply_message_soa(cfg, state, k, m, i)
        return new, (rec, new[0], new[1])

    idxs = jnp.arange(msgs.shape[0], dtype=I32)
    final, (recs, asks_h, bids_h) = jax.lax.scan(
        step, soa, (keys, msgs, idxs), unroll=_unroll(cfg))
    trades = _scan_trades(cfg, final, book_state[2], recs, msgs)
    asks_hist = jnp.stack([x[-n_steps:] for x in asks_h], axis=2)
    bids_hist = jnp.stack([x[-n_steps:] for x in bids_h], axis=2)
    return (asks_hist, bids_hist, _trades_from_soa(trades))


def _scan_bidask_impl(cfg, key, msgs, book_state, n_steps: int):
    keys = jax.random.split(key, msgs.shape[0])
    soa = _scan_init(cfg, book_state)

    def step(state, xs):
        k, m, i = xs
        new, rec = _apply_message_soa(cfg, state, k, m, i)
        best_ask, best_bid = _best_bid_ask_quants_soa(cfg, new[0], new[1])
        return new, (rec, best_ask, best_bid)

    idxs = jnp.arange(msgs.shape[0], dtype=I32)
    final, (recs, asks_hist, bids_hist) = jax.lax.scan(
        step, soa, (keys, msgs, idxs), unroll=_unroll(cfg))
    trades = _scan_trades(cfg, final, book_state[2], recs, msgs)
    last = (_side_from_soa(final[0]), _side_from_soa(final[1]),
            _trades_from_soa(trades))
    return last, (asks_hist[-n_steps:], bids_hist[-n_steps:]), recs


def _overflow_flag(cfg, recs):
    """Runtime exactness certificate: True iff some message's fill count
    exceeded ``trade_capture_cap`` this scan — the one condition under which
    the capped trade buffer can deviate from fully-exact capture (see
    _finalize_trades; the overflow slot itself stays exact via the last-fill
    record). When this is False the scan's trades output is bit-identical to
    a cap = nTrades run, so a capped rollout with a clean certificate is
    *certified* exact at the capped mode's throughput (BASELINE.md
    "trade-capture cap"). Fill counts per message are already in the scan
    records: compressed mode carries K at COMPRESSED_FILLCOUNT_IDX, inscan
    emits (k,)."""
    K = (recs[COMPRESSED_FILLCOUNT_IDX]
         if _trade_mode(cfg) == "compressed" else recs[0])
    return jnp.any(K > _trade_cap(cfg))


def scan_messages_save_bidask(cfg, key, msgs, book_state, n_steps: int):
    """As scan_messages, saving best bid/ask (price, quantity) after each of
    the last ``n_steps`` messages
    (reference: scan_through_entire_array_save_bidask :791-823)."""
    last, hist, _ = _scan_bidask_impl(cfg, key, msgs, book_state, n_steps)
    return last, hist


def scan_messages_save_bidask_cert(cfg, key, msgs, book_state, n_steps: int):
    """scan_messages_save_bidask + the per-scan overflow certificate
    (_overflow_flag). Returns (last_state, (asks_hist, bids_hist),
    overflow: bool scalar)."""
    last, hist, recs = _scan_bidask_impl(cfg, key, msgs, book_state, n_steps)
    return last, hist, _overflow_flag(cfg, recs)


# --------------------------------------------------------------------------- #
# Agent cancel-message generation
# --------------------------------------------------------------------------- #

def get_cancel_msgs(bookside: jax.Array, agent_id, size: int, side,
                    cancel_time, cancel_time_ns) -> jax.Array:
    """Fixed-size array of type-2 cancels for all of a trader's standing
    orders (reference: getCancelMsgs :827-853; rows past the trader's order
    count are all-zero no-op messages).

    The first-`size`-matches selection is a one-hot compare/reduce — the
    direct translation (`jnp.where(size=...)` + row gather) lowers to a
    serialised gather on TPU. occurrence index r selects the r-th matching
    row: W[r, j] = match_j & (cumsum(match)_j - 1 == r); rows with no r-th
    match sum the picked fields to zero, reproducing the reference's zero
    pad row (type/side/time are filled on pad rows too, exactly as the
    reference does)."""
    match = bookside[:, OrderCol.TID] == agent_id
    pos = _cumsum_i32(match.astype(I32)) - 1                           # (n,)
    W = (match[None, :]
         & (pos[None, :] == jax.lax.broadcasted_iota(I32, (size, 1), 0)))

    def pick(col):
        return jnp.sum(jnp.where(W, bookside[:, col][None, :], 0),
                       axis=1).astype(I32)

    full = jnp.full((size,), 1, I32)
    out = jnp.stack([
        full * 2,
        full * side,
        pick(OrderCol.QUANT),
        pick(OrderCol.PRICE),
        pick(OrderCol.OID),
        pick(OrderCol.TID),
        full * cancel_time,
        full * cancel_time_ns,
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
    return _onehot_row_set(trades, idx, new_trade)
