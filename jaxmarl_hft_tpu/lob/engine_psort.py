"""Parity-sorted matching engine: sorted-book O(n log n)/message kernels
with full bit-parity to the exact engine (and therefore the reference).

The exact engine (engine.py) keeps the reference's slot layout and pays a
per-message (nTrades, nOrders) one-hot for exact trade capture. This engine
keeps each side **sorted by price-time priority, best first** (like
engine_sorted.py) so that

  * matching is a prefix mask + exclusive cumsum,
  * the fills of a message are rows [0, k) in fill order, and
  * the trade-buffer write is a log-step barrel roll by the cursor —
    O(nTrades log nTrades) per message and INDEPENDENT of
    trade_capture_cap, so full exactness costs nothing extra,

while restoring bit-parity with the reference slot layout (which
engine_sorted.py deliberately gives up) by carrying, per side:

  * ``refslot`` (row space) — the reference slot each order occupies, used
    for every slot-order tie-break the reference bakes in: equal-(price,
    time_s, time_ns) priority (JaxOrderBookArrays.py add_order :62-83 picks
    the first -1 row; the pairwise priority matrix :167-171 tie-breaks on
    raw slot index), first-match cancel selection (:93-117), and the
    ``.at[-1]`` unmatched-cancel / full-book quirks;
  * ``P`` (slot space) — the inverse permutation slot -> row. Because rows
    only ever move by shifts and rolls with scalar offsets, ``P`` is
    maintained with O(n) arithmetic (no scatters);
  * ``A1`` (slot space) — "this occupied slot's row contains a -1 field",
    because the reference's add_order scans the whole (n, 6) row for -1, so
    a live order with a -1 field is clobberable by the next insert.

The trade cursor is carried as a scalar that advances by the *uncapped*
fill count of each message, replicating engine._finalize_trades's
``base0 + cumsum(K)`` slot assignment bit-for-bit at every
``trade_capture_cap`` (including the allocated-gap behaviour when a message
overflows the cap, and the last-slot overflow wrap of
reference match_order :205-217). Only the 4 *passive* trade columns plus a
writer-message-index plane (MIDX) ride the scan carry; aggressor columns
are reconstructed once per scan (``_trades_final``) — the scan is
carry-bandwidth-bound, so carried bytes are the scarce resource
(BASELINE.md round-3 records, incl. the rejected deferred-compaction
redesign that cut ~100 ops/message and measured slower).

Out-of-domain corners (documented, not supported): messages the environment
never emits can corrupt *empty* slots in the reference — a negative-quant
cancel aimed at an empty slot leaves a residue quantity (q = -1 - quant > 0
on an all--1 row), and a price == -1 limit add parks a junk row that every
valid-mask ignores. This engine's empty slots are always all--1. Every
in-domain path — zero-quant adds (every fully-matched limit order is one),
clobbers of any-neg1 rows, oid == -1 cancels probing empty slots, init-id
and random cancel fallbacks with bit-exact PRNG, full-book eviction, and
all trade-buffer overflow quirks — is replicated and asserted bit-for-bit
against the exact engine in tests/test_engine_psort.py.

Select with WorldConfig.matching_engine = "psort".
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import constants as cst
from ..config.constants import MsgCol
from . import engine as ex

I32 = jnp.int32


def _idx_dtype(n: int):
    """Dtype for the carried index planes (refslot rows and the inverse
    permutation P): values live in [0, n] with -1 sentinels, so int8
    suffices at the reference capacity (nOrders = 100). The scan is
    carry-bandwidth-bound (BASELINE.md round-3 sensitivity: carried BYTES,
    not ops, move it), so the index planes ride the carry at 1/4 width;
    compute that needs wider arithmetic promotes locally and casts back."""
    return jnp.int8 if n <= 126 else I32


def _midx_dtype(m: int):
    """Dtype for the carried trade writer-message-index plane: values in
    [-2, m); int16 covers every per-step scan (<= ~220 msgs) and whole-
    window init replays up to 32k messages."""
    return jnp.int16 if m < 2**15 - 1 else I32


def domain_violations(msgs):
    """Per-message mask of the out-of-domain fields where this engine's
    behaviour deliberately diverges from the reference on *empty slots*
    (module docstring): a negative quantity (cancel residue corruption) or
    a -1 price on an active message type (junk-row add). The environment
    never emits these; standalone callers feeding unvalidated streams
    through get_scan_fns can gate on this mask (jittable) or call
    ``assert_in_domain`` host-side."""
    t = msgs[..., MsgCol.TYPE]
    active = (t >= 1) & (t <= 4)
    return active & ((msgs[..., MsgCol.QUANT] < 0)
                     | (msgs[..., MsgCol.PRICE] == -1))


def assert_in_domain(msgs):
    """Host-side guard for standalone psort callers (not usable under jit;
    see domain_violations for the jittable mask)."""
    import numpy as np
    bad = np.asarray(domain_violations(jnp.asarray(msgs)))
    if bad.any():
        idx = np.argwhere(bad)[:5].tolist()
        raise ValueError(
            f"psort domain violation at message indices {idx}: negative "
            "quantity or price == -1 on an active message — the reference "
            "corrupts empty slots here and psort intentionally does not "
            "(engine_psort module docstring); use matching_engine='exact' "
            "for bit-parity on such streams")


def _iota(n):
    return jax.lax.broadcasted_iota(I32, (n,), 0)


def _shift_left1(plane, fill_value):
    return jnp.concatenate(
        [plane[1:], jnp.full((1,), fill_value, plane.dtype)])


def _shift_right1(plane, fill_value):
    return jnp.concatenate(
        [jnp.full((1,), fill_value, plane.dtype), plane[:-1]])


def _roll_dynamic(plane, shift, n):
    """jnp.roll(plane, shift) for a traced shift in [0, n) as log-step
    masked static rolls (a dynamic roll serialises on TPU)."""
    s = 1
    while s < n:
        plane = jnp.where((shift & s) != 0, jnp.roll(plane, s), plane)
        s <<= 1
    return plane


def _sel_scalar(plane, idx):
    """plane[idx] via one-hot reduction (no gather); 0 when idx outside."""
    return jnp.sum(jnp.where(_iota(plane.shape[0]) == idx, plane, 0))


def _min_where(mask, vals, default):
    return jnp.min(jnp.where(mask, vals, default))


# --------------------------------------------------------------------------- #
# Scan-boundary conversions (once per scan, amortised over the messages)
# --------------------------------------------------------------------------- #

def _side_init(slot_soa, side_is_bid):
    """Slot-layout SoA -> (rows7, P, A1). rows7 = the 6 order fields plus
    refslot, in priority-rank order (engine._compute_rank's (price, ts, tn,
    slot) lexicographic order); P = slot -> row (n for empty slots);
    A1[s] = occupied slot s's row contains a -1 field."""
    p = slot_soa[0]
    n = p.shape[0]
    rank = ex._compute_rank(slot_soa, side_is_bid)        # slot -> rank
    valid = p != -1
    R = rank[None, :] == _iota(n)[:, None]                # (row, slot) onehot

    def to_rows(pl, sentinel):
        v = jnp.sum(jnp.where(R, pl[None, :], 0), axis=1).astype(I32)
        got = jnp.any(R, axis=1)
        return jnp.where(got, v, sentinel)

    rows = tuple(to_rows(pl, -1) for pl in slot_soa)
    idt = _idx_dtype(n)
    refslot = to_rows(_iota(n), n).astype(idt)
    P = jnp.where(valid, rank, n).astype(idt)
    anyneg = ((slot_soa[0] == -1) | (slot_soa[1] == -1)
              | (slot_soa[2] == -1) | (slot_soa[3] == -1)
              | (slot_soa[4] == -1) | (slot_soa[5] == -1))
    A1 = valid & anyneg
    return rows + (refslot,), P, A1


def _side_to_slots(rows7, P):
    """(rows7, P) -> slot-layout SoA, bit-identical to the exact engine's
    final state (empty slots all -1)."""
    n = P.shape[0]
    S = P[:, None] == _iota(n)[None, :]                   # (slot, row) onehot
    occ = P < n

    def pick(pl):
        v = jnp.sum(jnp.where(S, pl[None, :], 0), axis=1).astype(I32)
        return jnp.where(occ, v, -1)

    return tuple(pick(pl) for pl in rows7[:6])


# --------------------------------------------------------------------------- #
# Matching + in-scan trade write
# --------------------------------------------------------------------------- #

def _match_psort(cfg, opp, oppP, oppA1, trades, tbase, qtm, price, msg_idx,
                 s_eff, opp_is_ask):
    """Match ``qtm`` at ``price`` against the sorted opposing side; write the
    fills straight into the carried trade planes (rows [0, k) land at trade
    slots [tbase, tbase + min(k, cap)) via a barrel roll; overflow wraps the
    globally-last fill into slot nTrades - 1, matching
    engine._apply_overflow_last).

    The carry holds only the 4 *passive* trade columns (price, signed
    quantity, passive oid, passive tid) plus a writer-message index plane
    MIDX — the 4 aggressor columns are per-message scalars reconstructed
    once per scan by ``_trades_final`` (the exact engine's inscan trick,
    engine._write_trades_inscan), trimming 3/8 of the carried trade state's
    scan traffic."""
    p, q, oid, tid, ts, tn, rs = opp
    n = p.shape[0]
    nT = cfg.nTrades
    cap = ex._trade_cap(cfg)
    valid = p != -1
    crossing = valid & jnp.where(opp_is_ask, p <= price, p >= price)

    qc = jnp.where(crossing, q, 0)
    cum_excl = ex._cumsum_i32(qc) - qc
    fill = jnp.where(crossing, jnp.clip(qtm - cum_excl, 0, q), 0).astype(I32)
    qtm_left = (qtm - jnp.sum(fill)).astype(I32)
    filled = fill > 0
    k = jnp.sum(filled).astype(I32)

    # ---- trade-buffer write ----------------------------------------------
    t_idx = _iota(nT)
    base = tbase
    in_range = ((t_idx >= base) & (t_idx < base + jnp.minimum(k, cap))
                & (t_idx < nT - 1))
    write_last = (k > 0) & (base + k - 1 >= nT - 1)
    sh = jnp.minimum(base, nT - 1)                        # roll only matters
    #                                                       while base < nT-1

    def place(field_n):
        src = field_n[:nT] if n >= nT else jnp.concatenate(
            [field_n, jnp.zeros((nT - n,), field_n.dtype)])
        return _roll_dynamic(src, sh, nT)

    signed_fill = (-s_eff * fill).astype(I32)
    roll_fields = (p, signed_fill, oid, tid)     # -> (P, Q, POID, PTID)
    last_sel = _iota(n) == (k - 1)

    new_trades = []
    for f, fld in enumerate(roll_fields):
        cur = trades[f]
        v = jnp.where(in_range, place(fld), cur)
        last = jnp.sum(jnp.where(last_sel, fld, 0)).astype(I32)
        v = jnp.where(write_last & (t_idx == nT - 1), last, v)
        new_trades.append(v.astype(I32))
    midx = trades[4]
    midx_v = jnp.asarray(msg_idx, midx.dtype)
    midx = jnp.where(in_range, midx_v, midx)
    midx = jnp.where(write_last & (t_idx == nT - 1), midx_v, midx)
    new_trades.append(midx)

    new_tbase = (base + k).astype(I32)          # uncapped: engine.
    #                                             _finalize_trades cum slots

    # ---- book update: fully-filled rows are the prefix [0, d) -------------
    q2 = (q - fill).astype(I32)
    deadf = filled & (q2 <= 0)
    d = jnp.sum(deadf).astype(I32)
    nv = jnp.sum(valid).astype(I32)
    rolled = tuple(_roll_dynamic(pl, n - d, n)
                   for pl in (p, q2, oid, tid, ts, tn, rs))
    keep = _iota(n) < nv - d
    sent = (-1, -1, -1, -1, -1, -1, n)
    new_opp = tuple(jnp.where(keep, pl, s_).astype(pl.dtype)
                    for pl, s_ in zip(rolled, sent))
    newP = jnp.where(oppP < d, n,
                     jnp.where(oppP < n, oppP - d, n)).astype(oppP.dtype)
    newA1 = jnp.where(oppP < d, False, oppA1)
    return (new_opp, newP, newA1, tuple(new_trades), new_tbase, qtm_left, k)


# --------------------------------------------------------------------------- #
# Eviction, add (with clobber), cancel
# --------------------------------------------------------------------------- #

def _evict_worst_if_full_psort(own, P, A1):
    """Full side (every slot holds a p >= 0 order): clear all orders at the
    worst price — the tail of the sorted rows (reference check_book_fill
    :395-408)."""
    p = own[0]
    n = p.shape[0]
    full = jnp.all(p >= 0)                    # rows all valid <=> slots full
    worst = p[n - 1]
    clear_rows = full & (p == worst)          # contiguous suffix
    cnt = jnp.sum(clear_rows).astype(I32)
    e = n - cnt                               # first cleared row
    sent = (-1, -1, -1, -1, -1, -1, n)
    new_own = tuple(jnp.where(clear_rows, s_, pl).astype(pl.dtype)
                    for pl, s_ in zip(own, sent))
    cleared_slot = full & (P >= e) & (P < n)
    newP = jnp.where(cleared_slot, n, P).astype(P.dtype)
    newA1 = jnp.where(cleared_slot, False, A1)
    return new_own, newP, newA1


def _remove_row(own, P, A1, r, slot_of_r):
    """Remove row ``r`` (shift-compact); no-op when r >= n."""
    n = own[0].shape[0]
    occ = r < n
    ii = _iota(n)
    sent = (-1, -1, -1, -1, -1, -1, n)
    new_own = tuple(
        jnp.where(occ & (ii >= r), _shift_left1(pl, s_), pl).astype(pl.dtype)
        for pl, s_ in zip(own, sent))
    newP = jnp.where(occ & (P == r), n,
                     jnp.where(occ & (P > r) & (P < n), P - 1, P)
                     ).astype(P.dtype)
    newA1 = jnp.where(occ & (_iota(n) == slot_of_r), False, A1)
    return new_own, newP, newA1


def _add_order_psort(own, P, A1, own_is_bid, price, quant, oid_v, tid_v,
                     ts_v, tn_v):
    """Insert at the first slot whose row contains any -1 (clobbering the
    occupant, if one exists — reference add_order :62-83), at the priority
    position with the reference's slot-index tie-break; a zero-quantity add
    still clobbers (the written row is swept immediately, matching
    engine._add_order_soa)."""
    n = own[0].shape[0]
    F = (P == n) | A1                          # insertable slots
    s_star = ex._first_true(F)
    s_slot = jnp.where(s_star < 0, n - 1, s_star)
    # P[s_slot] in one pass: n marks "free" (s_slot is always in [0, n))
    r_c = _sel_scalar(jnp.where(P < n, P, n), s_slot)
    occ_c = r_c < n

    quant = jnp.maximum(0, quant)
    alive = quant > 0
    ii = _iota(n)
    rm_mask = occ_c & (ii >= r_c)

    # rows after the clobber removal (pos is computed on this view, exactly
    # as the exact engine computes it over others_valid)
    sents = (-1, -1, -1, -1, -1, -1, n)
    own_rm = tuple(jnp.where(rm_mask, _shift_left1(pl, s_), pl)
                   for pl, s_ in zip(own, sents))
    p, q, oid, tid, ts, tn, rs = own_rm
    valid = p != -1
    price_better = jnp.where(own_is_bid, p > price, p < price)
    time_better_or_tie = (ts < ts_v) | ((ts == ts_v) & (
        (tn < tn_v) | ((tn == tn_v) & (rs < s_slot))))
    before = valid & (price_better | ((p == price) & time_better_or_tie))
    pos = jnp.sum(before).astype(I32)

    # removal + insert fused: final[i] = new at pos, rows_rm[i-1] above it,
    # rows_rm[i] below — the not-alive case (zero-quant add = clobber only)
    # folds in through the masks
    m_new = alive & (ii == pos)
    m_after = alive & (ii > pos)
    new_vals = (price, quant, oid_v, tid_v, ts_v, tn_v, s_slot)
    new_own = tuple(
        jnp.where(m_new, jnp.asarray(v, I32).astype(pl.dtype),
                  jnp.where(m_after, _shift_right1(pl, -1), pl)
                  ).astype(pl.dtype)
        for pl, v in zip(own_rm, new_vals))

    # inverse permutation: drop the clobbered row, then open row `pos`
    P1 = jnp.where(occ_c & (P == r_c), n,
                   jnp.where(occ_c & (P > r_c) & (P < n), P - 1, P))
    P2 = jnp.where(alive & (P1 >= pos) & (P1 < n), P1 + 1, P1)
    newP = jnp.where(ii == s_slot,
                     jnp.where(alive, pos, n), P2).astype(P.dtype)

    anyneg_new = ((price == -1) | (quant == -1) | (oid_v == -1)
                  | (tid_v == -1) | (ts_v == -1) | (tn_v == -1))
    newA1 = jnp.where(ii == s_slot, alive & anyneg_new, A1)
    return new_own, newP, newA1


def _cancel_slot_psort(cfg, key, own, P, price, quant, msg_oid):
    """Reference slot index to cancel (or -1): first-slot oid match, then
    init-order fallback, then (modes 2/3) random fallback — each respecting
    the reference's slot-order scan, including empty slots whose sentinel
    fields (-1) satisfy the predicate (engine._cancel_idx_soa)."""
    p, q, oid, tid, ts, tn, rs = own
    n = p.shape[0]
    first_free = ex._first_true(P == n)
    first_free = jnp.where(first_free < 0, n, first_free)

    def first_slot(row_mask, free_pred):
        cand_rows = _min_where(row_mask, rs, n)
        cand_free = jnp.where(free_pred, first_free, n)
        c = jnp.minimum(cand_rows, cand_free)
        return jnp.where(c < n, c, -1)

    idx = first_slot(oid == msg_oid, msg_oid == -1)

    init_rows = ((p == price) & (oid <= cfg.init_id)
                 & (oid >= cfg.init_id - cfg.book_depth * 2) & (q >= quant))
    init_free = ((price == -1) & (-1 <= cfg.init_id)
                 & (-1 >= cfg.init_id - cfg.book_depth * 2) & (quant <= -1))
    idx = jnp.where(idx == -1, first_slot(init_rows, init_free), idx)

    if cfg.cancel_mode in (2, 3):
        # slot-order oid array (the reference draws by inverse-CDF over the
        # slot-ordered weights, so the array order is PRNG-visible)
        S = P[:, None] == _iota(n)[None, :]               # (slot, row)
        occ = P < n
        p_s = jnp.where(occ, jnp.sum(jnp.where(S, p[None, :], 0), axis=1),
                        -1).astype(I32)
        q_s = jnp.where(occ, jnp.sum(jnp.where(S, q[None, :], 0), axis=1),
                        -1).astype(I32)
        oid_s = jnp.where(occ, jnp.sum(jnp.where(S, oid[None, :], 0),
                                       axis=1), -1).astype(I32)

        def rand_slot(k, require_quant):
            m = p_s == price
            if require_quant:
                m = m & (q_s >= quant)
            ids = jnp.where(m, oid_s, 0)
            k2, _ = jax.random.split(k)
            chosen = jax.random.choice(
                k2, ids, p=jnp.abs(jnp.sign(ids)).astype(jnp.float32))
            return first_slot(oid == chosen, chosen == -1)

        r = rand_slot(key, True)
        if cfg.cancel_mode == 3:
            inner, _ = jax.random.split(key)
            r = jnp.where(r == -1, rand_slot(inner, False), r)
        idx = jnp.where(idx == -1, r, idx)
    return idx


def _cancel_psort(cfg, key, own, P, A1, price, quant, msg_oid):
    """Subtract quantity at the matched slot's row; an unmatched cancel hits
    slot n-1 (.at[-1] reference quirk — a no-op when that slot is empty and
    quant >= 0); a row reaching q <= 0 is removed (sweep)."""
    n = own[0].shape[0]
    idx = _cancel_slot_psort(cfg, key, own, P, price, quant, msg_oid)
    slot_c = jnp.where(idx < 0, n - 1, idx)
    r_c = _sel_scalar(jnp.where(P < n, P, n), slot_c)
    occ_c = r_c < n

    p, q, oid, tid, ts, tn, rs = own
    row_sel = _iota(n) == r_c
    q2 = jnp.where(row_sel, q - quant, q).astype(I32)
    q2_r = jnp.sum(jnp.where(row_sel, q2, 0))
    removed = occ_c & (q2_r <= 0)

    rows_q = (p, q2, oid, tid, ts, tn, rs)
    return _remove_row(rows_q, P, A1, jnp.where(removed, r_c, n), slot_c)


# --------------------------------------------------------------------------- #
# Branchless unified message application
# --------------------------------------------------------------------------- #

def _apply_message_psort(cfg, state, key, msg, msg_idx=0):
    """Dispatch semantics of engine._apply_message_soa on the parity-sorted
    carry (rows7 + P + A1 per side, passive trade planes + MIDX + cursor).
    Returns (new_state, fill_count) — the uncapped per-message fill count
    feeds the runtime exactness certificate (engine._overflow_flag
    semantics: the capped trade write deviates from fully-exact capture
    iff fill_count > trade_capture_cap; psort mirrors the exact engine's
    capped output for bit-parity at every cap)."""
    (asks, P_a, A1_a, bids, P_b, A1_b, trades, tbase) = state
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
    ownP = jnp.where(active_is_bid, P_b, P_a)
    oppP = jnp.where(active_is_bid, P_a, P_b)
    ownA1 = jnp.where(active_is_bid, A1_b, A1_a)
    oppA1 = jnp.where(active_is_bid, A1_a, A1_b)
    opp_is_ask = active_is_bid

    price = msg[MsgCol.PRICE]
    quant = msg[MsgCol.QUANT]

    match_price = price
    if cfg.type_4_interpretation == cst.Type4.MKT:
        match_price = jnp.where(idx == 0, 0, price)

    qtm = jnp.where(is_lim, quant, 0)
    (opp_m, oppP_m, oppA1_m, trades_m, tbase_m, qtm_left, k_fill) = \
        _match_psort(
        cfg, opp, oppP, oppA1, trades, tbase, qtm, match_price,
        jnp.asarray(msg_idx, I32), s_eff=s_eff, opp_is_ask=opp_is_ask)

    own_fa, ownP_fa, ownA1_fa = own, ownP, ownA1
    if cfg.check_book_fill:
        own_fa, ownP_fa, ownA1_fa = _evict_worst_if_full_psort(own, ownP,
                                                               ownA1)

    add_price = match_price
    if cfg.type_4_interpretation == cst.Type4.MKT:
        add_price = jnp.where(idx == 1, cfg.maxint, match_price)

    own_add, ownP_add, ownA1_add = _add_order_psort(
        own_fa, ownP_fa, ownA1_fa, active_is_bid, add_price, qtm_left,
        msg[MsgCol.OID], msg[MsgCol.TID], msg[MsgCol.TIME_S],
        msg[MsgCol.TIME_NS])
    if cfg.type_4_interpretation in (cst.Type4.IOC, cst.Type4.MKT):
        suppress = t == 4
        own_lim = tuple(jnp.where(suppress, a_, b_)
                        for a_, b_ in zip(own_fa, own_add))
        ownP_lim = jnp.where(suppress, ownP_fa, ownP_add)
        ownA1_lim = jnp.where(suppress, ownA1_fa, ownA1_add)
    else:
        own_lim, ownP_lim, ownA1_lim = own_add, ownP_add, ownA1_add

    own_cx, ownP_cx, ownA1_cx = _cancel_psort(cfg, key, own, ownP, ownA1,
                                              price, quant, msg[MsgCol.OID])

    new_own = tuple(
        jnp.where(is_cancel, c_, jnp.where(is_lim, l_, o_))
        for c_, l_, o_ in zip(own_cx, own_lim, own))
    new_ownP = jnp.where(is_cancel, ownP_cx,
                         jnp.where(is_lim, ownP_lim, ownP))
    new_ownA1 = jnp.where(is_cancel, ownA1_cx,
                          jnp.where(is_lim, ownA1_lim, ownA1))
    new_opp = tuple(jnp.where(is_lim, m_, o_)
                    for m_, o_ in zip(opp_m, opp))
    new_oppP = jnp.where(is_lim, oppP_m, oppP)
    new_oppA1 = jnp.where(is_lim, oppA1_m, oppA1)
    new_trades = tuple(jnp.where(is_lim, m_, t_)
                       for m_, t_ in zip(trades_m, trades))
    new_tbase = jnp.where(is_lim, tbase_m, tbase)

    new_asks = tuple(jnp.where(active_is_bid, o_, w_)
                     for o_, w_ in zip(new_opp, new_own))
    new_bids = tuple(jnp.where(active_is_bid, w_, o_)
                     for o_, w_ in zip(new_opp, new_own))
    new_P_a = jnp.where(active_is_bid, new_oppP, new_ownP)
    new_P_b = jnp.where(active_is_bid, new_ownP, new_oppP)
    new_A1_a = jnp.where(active_is_bid, new_oppA1, new_ownA1)
    new_A1_b = jnp.where(active_is_bid, new_ownA1, new_oppA1)
    return ((new_asks, new_P_a, new_A1_a, new_bids, new_P_b, new_A1_b,
             new_trades, new_tbase),
            jnp.where(is_lim, k_fill, 0).astype(I32))


def _best_bid_ask_quants_psort(cfg, state):
    """Best (price, volume) per side, bit-equal to
    engine._best_bid_ask_quants_soa: the sorted rows are a permutation of
    the occupied slots, and the sentinel tail rows (-1, -1) correspond 1:1
    to the empty slots with the same values, so the slot-space reductions
    can run directly on the row planes."""
    return ex._best_bid_ask_quants_soa(cfg, state[0], state[3])


# --------------------------------------------------------------------------- #
# Public scan API (signature-compatible with engine.py)
# --------------------------------------------------------------------------- #

def _scan_init(cfg, book_state, n_msgs: int):
    asks, P_a, A1_a = _side_init(ex._side_to_soa(book_state[0]),
                                 side_is_bid=False)
    bids, P_b, A1_b = _side_init(ex._side_to_soa(book_state[1]),
                                 side_is_bid=True)
    tr = ex._trades_to_soa(book_state[2])
    first_empty = ex._first_true(tr[4] == -1)
    tbase = jnp.where(first_empty >= 0, first_empty,
                      cfg.nTrades - 1).astype(I32)
    # carried trade planes: passive columns + writer-message index (-1 =
    # empty, -2 = occupied before this scan — exact engine inscan scheme)
    midx = jnp.where(tr[4] == -1, -1, -2).astype(_midx_dtype(n_msgs))
    tcarry = (tr[0], tr[1], tr[2], tr[6], midx)
    return (asks, P_a, A1_a, bids, P_b, A1_b, tcarry, tbase)


def _trades_final(cfg, tcarry, init_trades_rows, msgs):
    """Full 8-plane trade buffer from the carried (P, Q, POID, PTID, MIDX):
    aggressor columns come from the writing message, rows the scan never
    wrote keep their initial content (identical to engine._scan_trades's
    inscan reconstruction)."""
    P, Q, POID, PTID, MIDX = tcarry
    init = ex._trades_to_soa(init_trades_rows)
    nT = P.shape[0]
    M = msgs.shape[0]
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


def _scan_final(cfg, state, init_trades_rows, msgs):
    return (ex._side_from_soa(_side_to_slots(state[0], state[1])),
            ex._side_from_soa(_side_to_slots(state[3], state[4])),
            ex._trades_from_soa(
                _trades_final(cfg, state[6], init_trades_rows, msgs)))


def scan_messages(cfg, key, msgs, book_state):
    keys = jax.random.split(key, msgs.shape[0])
    init = _scan_init(cfg, book_state, msgs.shape[0])

    def step(state, xs):
        k, m, i = xs
        new, _fills = _apply_message_psort(cfg, state, k, m, i)
        return new, None

    idxs = jnp.arange(msgs.shape[0], dtype=I32)
    final, _ = jax.lax.scan(step, init, (keys, msgs, idxs),
                            unroll=ex._unroll(cfg))
    return _scan_final(cfg, final, book_state[2], msgs)


def _scan_bidask_impl(cfg, key, msgs, book_state, n_steps: int):
    keys = jax.random.split(key, msgs.shape[0])
    init = _scan_init(cfg, book_state, msgs.shape[0])

    def step(state, xs):
        k, m, i = xs
        new, fills = _apply_message_psort(cfg, state, k, m, i)
        best_ask, best_bid = _best_bid_ask_quants_psort(cfg, new)
        return new, (fills, best_ask, best_bid)

    idxs = jnp.arange(msgs.shape[0], dtype=I32)
    final, (fills, asks_hist, bids_hist) = jax.lax.scan(
        step, init, (keys, msgs, idxs), unroll=ex._unroll(cfg))
    return (_scan_final(cfg, final, book_state[2], msgs),
            (asks_hist[-n_steps:], bids_hist[-n_steps:]), fills)


def scan_messages_save_bidask(cfg, key, msgs, book_state, n_steps: int):
    last, hist, _ = _scan_bidask_impl(cfg, key, msgs, book_state, n_steps)
    return last, hist


def scan_messages_save_bidask_cert(cfg, key, msgs, book_state, n_steps: int):
    """save_bidask + exactness certificate (engine._overflow_flag
    semantics). psort mirrors the exact engine's capped trade write for
    bit-parity at EVERY cap, so the flag fires exactly like the exact
    engine's: iff a message fills more than trade_capture_cap standing
    orders. At the default cap = nTrades (all shipped psort presets) it
    cannot fire while nOrders <= nTrades; the fill counts it reduces over
    were already computed by the matcher."""
    last, hist, fills = _scan_bidask_impl(cfg, key, msgs, book_state,
                                          n_steps)
    return last, hist, jnp.any(fills > ex._trade_cap(cfg))


def scan_messages_save_states(cfg, key, msgs, book_state, n_steps: int):
    """Debug-path variant: converts to slot layout after every message (the
    per-message (n, n) conversion is paid only in debug mode)."""
    keys = jax.random.split(key, msgs.shape[0])
    init = _scan_init(cfg, book_state, msgs.shape[0])

    def step(state, xs):
        k, m, i = xs
        new, _fills = _apply_message_psort(cfg, state, k, m, i)
        a = ex._side_from_soa(_side_to_slots(new[0], new[1]))
        b = ex._side_from_soa(_side_to_slots(new[3], new[4]))
        return new, (a, b)

    idxs = jnp.arange(msgs.shape[0], dtype=I32)
    final, (asks_h, bids_h) = jax.lax.scan(step, init, (keys, msgs, idxs),
                                           unroll=ex._unroll(cfg))
    return (asks_h[-n_steps:], bids_h[-n_steps:],
            ex._trades_from_soa(
                _trades_final(cfg, final[6], book_state[2], msgs)))


def apply_message(cfg, book_state, key, msg):
    state, _fills = _apply_message_psort(
        cfg, _scan_init(cfg, book_state, 1), key, msg, 0)
    return _scan_final(cfg, state, book_state[2], msg[None, :])
