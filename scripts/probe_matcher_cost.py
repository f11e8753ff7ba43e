"""Ablation: how much of the exact engine's fixed per-message cost is the
(n,n) priority/better matrix in _match_soa vs everything else?

Monkeypatches engine._match_soa with progressively cheaper (semantically
WRONG, timing-only) variants and re-times the scan.
"""
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import jax
import jax.numpy as jnp
import numpy as np

from _probe_util import timed_scan
from reference_oracle import init_book_messages, random_message_stream
from jaxmarl_hft_tpu.config.structs import LobConfig
from jaxmarl_hft_tpu.lob import engine

I32 = jnp.int32
N_ENVS = 2048
N_MSGS = 112


def timed(label, cfg, keys, msgs, state_b):
    vscan = jax.vmap(lambda k, m, s: engine.scan_messages_save_bidask(
        cfg, k, m, s, N_MSGS))

    def body(i, keys, msgs, state_b):
        return vscan(keys, msgs.at[:, 0, 2].add(i % 2), state_b)

    return timed_scan(label, body, (keys, msgs, state_b))


def main():
    cfg = LobConfig(trade_capture_cap=16)
    rng = np.random.default_rng(0)
    init_msgs = jnp.asarray(init_book_messages(rng), jnp.int32)
    state0 = (engine.init_orderside(cfg.nOrders),
              engine.init_orderside(cfg.nOrders),
              engine.init_trades(cfg.nTrades))
    state0, _ = engine.scan_messages_save_bidask(
        cfg, jax.random.PRNGKey(0), init_msgs, state0, init_msgs.shape[0])
    state_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (N_ENVS,) + x.shape), state0)
    keys = jax.random.split(jax.random.PRNGKey(1), N_ENVS)
    msgs = jnp.asarray(np.stack([
        random_message_stream(np.random.default_rng(100 + e), N_MSGS)
        for e in range(64)]), jnp.int32)
    msgs = jnp.tile(msgs, (N_ENVS // 64, 1, 1))
    print(f"device={jax.devices()[0]} envs={N_ENVS} msgs={N_MSGS}",
          flush=True)

    orig = engine._match_soa

    timed("baseline (full matcher)", cfg, keys, msgs, state_b)

    # Variant A: ablate the prefix-quantity term (S = 0). With the cumq
    # matcher this no longer removes an (n,n) matrix — kept to measure the
    # residual cost of the carried-plane arithmetic.
    def match_noS(cap, opp, opp_rank, opp_cumq, qtm, price, opp_is_ask):
        p, q, oid, tid, ts, tn = opp
        n = p.shape[0]
        valid = p != -1
        crossing = valid & jnp.where(opp_is_ask, p <= price, p >= price)
        S = jnp.zeros_like(q)                       # <-- ablated
        fill = jnp.where(crossing, jnp.clip(qtm - S, 0, q), 0).astype(I32)
        qtm_left = (qtm - jnp.sum(fill)).astype(I32)
        filled = fill > 0
        k = jnp.sum(filled).astype(I32)
        c_iota = jax.lax.broadcasted_iota(I32, (cap, n), 0)
        MC = filled[None, :] & (opp_rank[None, :] == c_iota)

        def cfield(vals):
            return jnp.sum(jnp.where(MC, vals[None, :], 0), axis=1
                           ).astype(I32)
        fills = (cfield(p), cfield(fill), cfield(oid), cfield(tid))
        last_sel = filled & (opp_rank == k - 1)

        def lfield(vals):
            return jnp.sum(jnp.where(last_sel, vals, 0)).astype(I32)
        last_fill = (lfield(p), lfield(fill), lfield(oid), lfield(tid))
        new_q = (q - fill).astype(I32)
        dead = new_q <= 0
        d = jnp.sum(dead & valid).astype(I32)
        neg1 = jnp.full_like(p, -1)
        new_opp = tuple(jnp.where(dead, neg1, x) for x in
                        (p, new_q, oid, tid, ts, tn))
        survivor = valid & ~dead
        new_rank = jnp.where(survivor, opp_rank - d, n).astype(I32)
        new_cumq = jnp.where(survivor, opp_cumq, 0)
        return new_opp, new_rank, new_cumq, qtm_left, fills, last_fill, k

    engine._match_soa = match_noS
    timed("A: no (n,n) better/S matrix", cfg, keys, msgs, state_b)

    # Variant B: additionally no compressed-fill extraction (MC matrix)
    def match_minimal(cap, opp, opp_rank, opp_cumq, qtm, price, opp_is_ask):
        p, q, oid, tid, ts, tn = opp
        n = p.shape[0]
        valid = p != -1
        crossing = valid & jnp.where(opp_is_ask, p <= price, p >= price)
        fill = jnp.where(crossing, jnp.minimum(qtm, q), 0).astype(I32)
        qtm_left = (qtm - jnp.sum(fill)).astype(I32)
        k = jnp.sum(fill > 0).astype(I32)
        z = jnp.zeros((cap,), I32)
        fills = (z, z, z, z)
        last_fill = (jnp.int32(0),) * 4
        new_q = (q - fill).astype(I32)
        dead = new_q <= 0
        neg1 = jnp.full_like(p, -1)
        new_opp = tuple(jnp.where(dead, neg1, x) for x in
                        (p, new_q, oid, tid, ts, tn))
        d = jnp.sum(dead & valid).astype(I32)
        new_rank = jnp.where(valid & ~dead, opp_rank - d, n).astype(I32)
        new_cumq = jnp.where(valid & ~dead, opp_cumq, 0)
        return new_opp, new_rank, new_cumq, qtm_left, fills, last_fill, k

    engine._match_soa = match_minimal
    timed("B: A + no fill extraction", cfg, keys, msgs, state_b)

    # Variant C: matcher is identity (isolates add/cancel/scan cost)
    def match_none(cap, opp, opp_rank, opp_cumq, qtm, price, opp_is_ask):
        z = jnp.zeros((cap,), I32)
        return (opp, opp_rank, opp_cumq, qtm,
                (z, z, z, z), (jnp.int32(0),) * 4, jnp.int32(0))

    engine._match_soa = match_none
    timed("C: matcher removed entirely", cfg, keys, msgs, state_b)

    engine._match_soa = orig


if __name__ == "__main__":
    main()
