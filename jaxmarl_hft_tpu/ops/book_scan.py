"""Pallas TPU kernel for the message-stream book scan — the framework's
innermost hot loop (reference: JaxOrderBookArrays.py:791-823
``scan_through_entire_array_save_bidask`` and the ``cond_type_side`` /
``match_order`` machinery underneath it, :555-637 / :172-331).

Why a kernel: the O(n)-per-message *sorted-book* algorithm
(lob/engine_sorted.py) is algorithmically 30x leaner than the exact-slot
rank-plane engine (lob/engine.py), but its primitive operations — prefix
cumsum, shift-by-one insertion, and per-env dynamic prefix drops — lower to
serialised swap loops under XLA:TPU (measured 137x *slower* end-to-end than
the exact engine). On the VPU those same operations are one-instruction lane
rotates. This kernel runs the sorted-book algorithm with

  * the full book (6 SoA planes x 2 sides) held in vector registers for the
    entire message stream — zero HBM traffic between messages (the lax scan
    round-trips the ~24 MB carry through HBM every message);
  * a batch tile of ``TILE_B`` environments in the sublane dimension and the
    ``nOrders`` book slots in the lane dimension, so every book operation is
    a fully-occupied (TILE_B, 128) vector op;
  * dynamic prefix compaction as log-step lane rotates with per-env masks;
  * per-message compressed fill records + best-bid/ask packed into one
    (TILE_B, 128) register and stored with a single dynamic-sublane write.

Semantics are bit-identical to lob/engine_sorted.py (FIFO tie-break sorted
layout; see its module docstring for the one slot-placement caveat vs the
reference) for ``cancel_mode`` 0/1; trade-buffer assembly reuses
lob/engine._finalize_trades outside the kernel, so trade rows match the
exact engine's append semantics. Equivalence is asserted in
tests/test_pallas_scan.py.

Select with WorldConfig.matching_engine = "pallas".
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import constants as cst
from ..config.constants import MsgCol
from ..lob import engine as ex
from ..lob import engine_sorted as es

I32 = jnp.int32
LANES = 128
TILE_B = 8
# Unroll the message loop in Python instead of lax.fori_loop. Static loop
# indices turn the per-message msgs read and rec store into static slices
# (no dynamic-sublane vector load/store, which Mosaic handles poorly) at the
# cost of a larger-to-compile kernel body. Interpret mode (CPU tests) keeps
# the rolled loop — tracing a 100+-message unrolled body through the
# interpreter is minutes-slow; tests cover the unrolled path with a small
# message count via _force_unroll.
_force_unroll = None        # tests: True/False overrides the backend default


def _use_unroll():
    if _force_unroll is not None:
        return _force_unroll
    return jax.default_backend() == "tpu"

# rec-register lane layout: [P(cap) | Q(cap) | OID(cap) | TID(cap) |
#                            LP LQ LOID LTID K AOID TS TN ATID |
#                            BA_price BA_vol BB_price BB_vol]
_N_SCALARS = 13          # 9 finalize scalars + 4 best-bid/ask channels


def _supports(cfg) -> bool:
    """Kernel preconditions (fallback to the lax engines otherwise)."""
    cap = ex._trade_cap(cfg)
    return (cfg.cancel_mode not in (2, 3)          # no in-kernel PRNG
            and cfg.nOrders <= LANES
            and 4 * cap + _N_SCALARS <= LANES)


def _roll(x, s):
    """Circular lane roll: out[i] = x[i - s] (static s)."""
    return pltpu.roll(x, s % LANES, axis=1)


def _scan_kernel(cfg, n, M, cap, unroll, msgs_ref, book_ref, out_ref,
                 rec_ref):
    """Grid program over one batch tile. msgs_ref (8, TB, Mpad);
    book_ref/out_ref (12, TB, LANES) = ask p,q,oid,tid,ts,tn then bid;
    rec_ref (TB, Mpad, LANES)."""
    lane = jax.lax.broadcasted_iota(I32, (TILE_B, LANES), 1)
    Mpad = msgs_ref.shape[2]
    mlane = jax.lax.broadcasted_iota(I32, (TILE_B, Mpad), 1)
    neg1 = jnp.full((TILE_B, LANES), -1, I32)
    zero = jnp.zeros((TILE_B, LANES), I32)
    off = 4 * cap

    def cumsum(x):
        for s in (1, 2, 4, 8, 16, 32, 64):
            x = x + jnp.where(lane >= s, _roll(x, s), 0)
        return x

    def first_idx(mask):
        """(TB,1) index of first True lane; -1 if none (jnp.where(size=1)
        parity, as in engine._first_true)."""
        idx = jnp.min(jnp.where(mask, lane, 2 * LANES), axis=1,
                      keepdims=True)
        return jnp.where(idx >= 2 * LANES, -1, idx)

    def row(planes, idx):
        """One-hot row extraction; idx (TB,1)."""
        sel = lane == idx
        return [jnp.sum(jnp.where(sel, p_, 0), axis=1, keepdims=True)
                for p_ in planes]

    def dyn_roll_left(planes, d):
        """Per-env left roll by d (TB,1) as log-step masked rotates."""
        for s in (1, 2, 4, 8, 16, 32, 64):
            bit = (d & s) != 0
            planes = [jnp.where(bit, _roll(p_, -s), p_) for p_ in planes]
        return planes

    def at_lane(j, v):
        """Scalar v (TB,1) placed at static lane j, zeros elsewhere."""
        return jnp.where(lane == j, v, 0)

    def body(m, planes):
        ap, aq, aoid, atid, ats, atn, bp, bq, boid, btid, bts, btn = planes
        asks = (ap, aq, aoid, atid, ats, atn)
        bids = (bp, bq, boid, btid, bts, btn)

        if unroll:
            col = [msgs_ref[f, :, m:m + 1] for f in range(8)]
        else:
            # Mosaic cannot load a single dynamic lane; select lane m of
            # the resident (TB, Mpad) field rows with a one-hot reduce.
            msel = mlane == m
            col = [jnp.sum(jnp.where(msel, msgs_ref[f], 0), axis=1,
                           keepdims=True) for f in range(8)]
        t = col[MsgCol.TYPE]
        s_raw = col[MsgCol.SIDE]
        quant_m = col[MsgCol.QUANT]
        price_m = col[MsgCol.PRICE]
        oid_m = col[MsgCol.OID]
        tid_m = col[MsgCol.TID]
        ts_m = col[MsgCol.TIME_S]
        tn_m = col[MsgCol.TIME_NS]

        s_eff = jnp.where(t == 4, -s_raw, s_raw)
        idx = ((((s_eff == -1) & ((t == 1) | (t == 4))) * 0)
               + (((s_eff == 1) & ((t == 1) | (t == 4))) * 1)
               + (((s_eff == -1) & ((t == 2) | (t == 3))) * 2)
               + (((s_eff == 1) & ((t == 2) | (t == 3))) * 3)
               + (((s_eff == 0) & (t == 0)) * 4))
        is_lim = idx <= 1
        is_cancel = (idx == 2) | (idx == 3)
        active_is_bid = (idx == 1) | (idx == 3)

        own = [jnp.where(active_is_bid, b_, a_)
               for a_, b_ in zip(asks, bids)]
        opp = [jnp.where(active_is_bid, a_, b_)
               for a_, b_ in zip(asks, bids)]
        opp_is_ask = active_is_bid

        match_price = price_m
        if cfg.type_4_interpretation == cst.Type4.MKT:
            match_price = jnp.where(idx == 0, 0, price_m)

        # ---- match: crossing orders are the prefix of the sorted side ----
        op, oq, ooid, otid, ots, otn = opp
        valid = op != -1
        # select-on-bool-vectors is unsupported by Mosaic; use logic ops
        crossing = valid & ((opp_is_ask & (op <= match_price))
                            | (~opp_is_ask & (op >= match_price)))
        qtm = jnp.where(is_lim, quant_m, 0)
        qc = jnp.where(crossing, oq, 0)
        cume = cumsum(qc) - qc
        fill = jnp.where(crossing, jnp.clip(qtm - cume, 0, oq), 0)
        qtm_left = qtm - jnp.sum(fill, axis=1, keepdims=True)
        filled = fill > 0
        k = jnp.sum(filled.astype(I32), axis=1, keepdims=True)

        # compressed fill record + last-fill row (engine.py fill_rec layout)
        sq_fill = -s_eff * fill
        in_cap = filled & (lane < cap)
        rec = (jnp.where(in_cap, op, 0)
               + _roll(jnp.where(in_cap, sq_fill, 0), cap)
               + _roll(jnp.where(in_cap, ooid, 0), 2 * cap)
               + _roll(jnp.where(in_cap, otid, 0), 3 * cap))
        last_sel = filled & (lane == k - 1)

        def last(v):
            return jnp.sum(jnp.where(last_sel, v, 0), axis=1, keepdims=True)

        for j, v in enumerate((last(op), last(sq_fill), last(ooid),
                               last(otid), k, oid_m, ts_m, tn_m, tid_m)):
            rec = rec + at_lane(off + j, v)

        # ---- opp-side update: drop the fully-filled prefix ---------------
        oq2 = oq - fill
        dead = filled & (oq2 <= 0)
        d = jnp.sum(dead.astype(I32), axis=1, keepdims=True)
        rolled = dyn_roll_left([op, oq2, ooid, otid, ots, otn], d)
        nv = jnp.sum(valid.astype(I32), axis=1, keepdims=True) - d
        keep = lane < nv
        opp_matched = [jnp.where(keep, p_, neg1) for p_ in rolled]

        # ---- own-side limit path: evict-if-full, then insert -------------
        own_for_add = own
        if cfg.check_book_fill:
            p0 = own[0]
            full = jnp.sum((p0 != -1).astype(I32), axis=1,
                           keepdims=True) >= n
            worst = p0[:, n - 1:n]
            clear = full & (p0 == worst)
            own_for_add = [jnp.where(clear, neg1, p_) for p_ in own]

        add_price = match_price
        if cfg.type_4_interpretation == cst.Type4.MKT:
            add_price = jnp.where(idx == 1, cfg.maxint, match_price)

        fp, fq, foid, ftid, fts, ftn = own_for_add
        add_quant = jnp.maximum(0, qtm_left)
        fvalid = fp != -1
        price_better = ((active_is_bid & (fp > add_price))
                        | (~active_is_bid & (fp < add_price)))
        time_leq = (fts < ts_m) | ((fts == ts_m) & (ftn <= tn_m))
        before = fvalid & (price_better
                           | ((fp == add_price) & time_leq))
        pos = jnp.sum(before.astype(I32), axis=1, keepdims=True)
        new_row = (add_price, add_quant, oid_m, tid_m, ts_m, tn_m)
        inserted = []
        for p_, v in zip(own_for_add, new_row):
            sh = jnp.where(lane == 0, -1, _roll(p_, 1))
            ins = jnp.where(lane < pos, p_,
                            jnp.where(lane == pos, v, sh))
            inserted.append(jnp.where(lane < n, ins, -1))
        skip = add_quant <= 0
        own_added = [jnp.where(skip, a_, b_)
                     for a_, b_ in zip(own_for_add, inserted)]
        if cfg.type_4_interpretation in (cst.Type4.IOC, cst.Type4.MKT):
            suppress = t == 4
            own_after_lim = [jnp.where(suppress, a_, b_)
                             for a_, b_ in zip(own_for_add, own_added)]
        else:
            own_after_lim = own_added

        # ---- cancel path -------------------------------------------------
        cp, cq, coid, ctid, cts, ctn = own
        in_n = lane < n          # pad lanes hold -1 planes; a -1 msg oid
        #                          must not match them (n-array parity)
        cidx = first_idx((coid == oid_m) & in_n)
        init_m = (in_n & (cp == price_m) & (coid <= cfg.init_id)
                  & (coid >= cfg.init_id - cfg.book_depth * 2)
                  & (cq >= quant_m))
        cidx = jnp.where(cidx == -1, first_idx(init_m), cidx)
        cidx_eff = jnp.where(cidx < 0, n + cidx, cidx)
        sel = lane == cidx_eff
        cq2 = jnp.where(sel, cq - quant_m, cq)
        removed = jnp.sum((sel & (cq2 <= 0) & (cp != -1)).astype(I32),
                          axis=1, keepdims=True) > 0
        cancelled = []
        for p_ in (cp, cq2, coid, ctid, cts, ctn):
            sh = jnp.where(lane == LANES - 1, -1, _roll(p_, -1))
            cancelled.append(jnp.where(removed & (lane >= cidx_eff),
                                       sh, p_))
        deadm = cancelled[1] <= 0
        own_cancelled = [jnp.where(deadm, neg1, p_) for p_ in cancelled]

        # ---- merge -------------------------------------------------------
        new_own = [jnp.where(is_cancel, c_,
                             jnp.where(is_lim, l_, o_))
                   for c_, l_, o_ in zip(own_cancelled, own_after_lim, own)]
        new_opp = [jnp.where(is_lim, m_, o_)
                   for m_, o_ in zip(opp_matched, opp)]

        nasks = [jnp.where(active_is_bid, np_, no_)
                 for np_, no_ in zip(new_opp, new_own)]
        nbids = [jnp.where(active_is_bid, no_, np_)
                 for np_, no_ in zip(new_opp, new_own)]

        # ---- best bid/ask (row 0 of each sorted side) --------------------
        ba = nasks[0][:, 0:1]
        bb = nbids[0][:, 0:1]
        # empty side: best price -1 matches the n empty rows' -1 quants
        # (reference get_volume_at_price parity — sum is -n, not 0);
        # restrict to lanes < n so the 128-lane padding doesn't add more
        bav = jnp.sum(jnp.where((nasks[0] == ba) & in_n, nasks[1], 0),
                      axis=1, keepdims=True)
        bbv = jnp.sum(jnp.where((nbids[0] == bb) & in_n, nbids[1], 0),
                      axis=1, keepdims=True)
        for j, v in enumerate((ba, bav, bb, bbv)):
            rec = rec + at_lane(off + 9 + j, v)

        if unroll:
            rec_ref[:, m, :] = rec
        else:
            rec_ref[:, pl.ds(m, 1), :] = rec[:, None, :]
        return tuple(nasks) + tuple(nbids)

    planes0 = tuple(book_ref[j] for j in range(12))
    if unroll:
        planes = planes0
        for m in range(M):
            planes = body(m, planes)
    else:
        planes = jax.lax.fori_loop(0, M, body, planes0)
    for j in range(12):
        out_ref[j] = planes[j]


def _batched_scan(cfg, M, key, msgs, book_state):
    """Batched kernel invocation. msgs (B, M, 8); book sides (B, n, 6);
    trades (B, nT, 8). Returns ((asks, bids, trades), (askhist, bidhist))
    with histories over all M messages."""
    del key                                  # cancel_mode 0/1: no PRNG use
    asks0, bids0, trades0 = book_state
    B, n = asks0.shape[0], asks0.shape[1]
    cap = ex._trade_cap(cfg)
    off = 4 * cap
    Mpad = -(-M // LANES) * LANES
    Bpad = -(-B // TILE_B) * TILE_B

    def pad_b(x):
        return (x if Bpad == B else
                jnp.pad(x, ((0, Bpad - B),) + ((0, 0),) * (x.ndim - 1)))

    msgs_t = jnp.transpose(pad_b(msgs), (2, 0, 1))       # (8, B, M)
    msgs_t = jnp.pad(msgs_t, ((0, 0), (0, 0), (0, Mpad - M)))
    sides = jnp.concatenate([pad_b(asks0), pad_b(bids0)], axis=2)
    book = jnp.transpose(sides, (2, 0, 1))               # (12, B, n)
    book = jnp.pad(book, ((0, 0), (0, 0), (0, LANES - n)),
                   constant_values=-1)

    grid = (Bpad // TILE_B,)
    out_book, recs = pl.pallas_call(
        functools.partial(_scan_kernel, cfg, n, M, cap, _use_unroll()),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, TILE_B, Mpad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, TILE_B, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((12, TILE_B, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, Mpad, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((12, Bpad, LANES), I32),
            jax.ShapeDtypeStruct((Bpad, Mpad, LANES), I32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(msgs_t, book)

    book_out = jnp.transpose(out_book[:, :B, :n], (1, 2, 0))  # (B, n, 12)
    asks = book_out[:, :, :6]
    bids = book_out[:, :, 6:]

    recs = recs[:B, :M, :]
    fin_recs = (
        recs[:, :, 0:cap], recs[:, :, cap:2 * cap],
        recs[:, :, 2 * cap:3 * cap], recs[:, :, 3 * cap:4 * cap],
        recs[:, :, off], recs[:, :, off + 1], recs[:, :, off + 2],
        recs[:, :, off + 3], recs[:, :, off + 4], recs[:, :, off + 5],
        recs[:, :, off + 6], recs[:, :, off + 7], recs[:, :, off + 8],
    )
    trades = jax.vmap(
        lambda tr, rc: ex._trades_from_soa(
            ex._finalize_trades(cfg, ex._trades_to_soa(tr), rc))
    )(trades0, fin_recs)

    askhist = recs[:, :, off + 9:off + 11]                # (B, M, 2)
    bidhist = recs[:, :, off + 11:off + 13]
    return (asks, bids, trades), (askhist, bidhist)


@functools.lru_cache(maxsize=None)
def _make_scan_bidask(cfg, n_steps):
    """Per-env ``scan_messages_save_bidask`` whose vmap over environments
    dispatches to the batched Pallas kernel (jax.custom_batching)."""

    @jax.custom_batching.custom_vmap
    def scan_bidask(key, msgs, book_state):
        return es.scan_messages_save_bidask(cfg, key, msgs, book_state,
                                            n_steps)

    @scan_bidask.def_vmap
    def _rule(axis_size, in_batched, key, msgs, book_state):
        key_b, msgs_b, book_b = in_batched
        if not msgs_b:
            msgs = jnp.broadcast_to(msgs, (axis_size,) + msgs.shape)
        book_state = tuple(
            x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)
            for x, b in zip(book_state, book_b))
        M = msgs.shape[1]
        (asks, bids, trades), (ah, bh) = _batched_scan(
            cfg, M, key, msgs, book_state)
        out = ((asks, bids, trades), (ah[:, -n_steps:], bh[:, -n_steps:]))
        return out, jax.tree.map(lambda _: True, out)

    return scan_bidask


def scan_messages_save_bidask(cfg, key, msgs, book_state, n_steps: int):
    """Drop-in for engine_sorted.scan_messages_save_bidask; per-env call
    falls back to the lax sorted engine, vmap hits the TPU kernel."""
    if not _supports(cfg):
        return es.scan_messages_save_bidask(cfg, key, msgs, book_state,
                                            n_steps)
    return _make_scan_bidask(cfg, n_steps)(key, msgs, book_state)
