"""Tokenized book+message observations for LM-style policies.

Parity reference: mm_env.py:2824-2959 (_get_obs_msg_new_tokenizer). The
reference depends on an external `lobgen` package for its token-offset
config (a broken import, mm_env.py:143-144); here the offsets live in a
self-contained TokenizerConfig with the same vocabulary layout: each int32
field is split into two 16-bit tokens shifted into per-field vocabulary
bands, and the pre-step L2 book state is bitcast into 16-bit tokens.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

U16_BAND = 1 << 16


@dataclass(frozen=True)
class TokenizerConfig:
    """Vocabulary band offsets (mirrors lobgen's tokenizer config fields
    used by the reference: EVENT_START, ORDER_ID_B_START, PRICE_B_START,
    SIZE_B_START, TIME_B_START, TOTAL_NUM_TOKENS)."""
    EVENT_START: int = 0
    ORDER_ID_B_START: int = 64                 # 64 event/dir tokens
    PRICE_B_START: int = 64 + U16_BAND
    SIZE_B_START: int = 64 + 2 * U16_BAND
    TIME_B_START: int = 64 + 3 * U16_BAND

    @property
    def TOTAL_NUM_TOKENS(self) -> int:
        return 64 + 4 * U16_BAND


def _split_and_offset(x, offset):
    """int32 -> (low16+off, high16+off) (reference :2900-2904)."""
    x = x.astype(jnp.int32)
    low = (x & 0xFFFF).astype(jnp.uint32) + offset
    high = ((x >> 16) & 0xFFFF).astype(jnp.uint32) + offset
    return jnp.stack([low, high], axis=-1)


def tokenize_messages(tok: TokenizerConfig, total_msgs, best_bids, best_asks,
                      old_mid_price):
    """Message-stream tokens: 13 tokens per message
    (reference :2835-2922)."""
    event = total_msgs[:, 0]
    direction = total_msgs[:, 1]
    order_id = total_msgs[:, 4]
    price = total_msgs[:, 3] // 100
    size = total_msgs[:, 2]
    time_s = total_msgs[:, 6]
    time_ns = total_msgs[:, 7]

    # delta times with nanosecond borrow (reference :2845-2855)
    ds = time_s[1:] - time_s[:-1]
    dns = time_ns[1:] - time_ns[:-1]
    ds = ds - (dns < 0)
    dns = jnp.where(dns < 0, dns + 1_000_000_000, dns)
    delta_time_s = jnp.concatenate([jnp.zeros((1,), ds.dtype), ds])
    delta_time_ns = jnp.concatenate([jnp.zeros((1,), dns.dtype), dns])

    # delta prices from the best-price histories (reference :2862-2887)
    bb = best_bids[:, 0] // 100
    ba = best_asks[:, 0] // 100
    mids = (bb + ba) // 2
    first = 2 * (mids[0] - old_mid_price // 100)
    rest = (ba[1:] - ba[:-1]) + (bb[1:] - bb[:-1])
    delta_price = jnp.concatenate(
        [jnp.asarray(first, rest.dtype)[None], rest])

    # direction {-1, 1} -> bit {0, 1}: ask events 1-4, bid events 5-8,
    # no-op rows 0 — all inside the 64-token event band. (The reference
    # computes direction.astype(uint8)*4 + event, where direction=-1 wraps
    # to 252+event mod 256 — outside the band, aliasing order-id tokens and
    # destroying the side for every ask message; that expression is dead
    # code upstream, so the working semantics live here.)
    event_dir_tok = ((direction == 1).astype(jnp.uint32) * 4
                     + event.astype(jnp.uint32)) + tok.EVENT_START

    toks = jnp.concatenate([
        event_dir_tok[:, None],
        _split_and_offset(order_id, tok.ORDER_ID_B_START),
        _split_and_offset(price, tok.PRICE_B_START),
        _split_and_offset(size, tok.SIZE_B_START),
        _split_and_offset(delta_time_s, tok.TIME_B_START),
        _split_and_offset(delta_time_ns, tok.TIME_B_START),
        _split_and_offset(delta_price, tok.PRICE_B_START),
    ], axis=-1)
    return toks.reshape(-1)


def _book_shift(tok: TokenizerConfig, n_levels: int):
    """Band-offset vector for the (time + L2) book token layout; shared by
    tokenize_book and detokenize_book so the layout lives in ONE place."""
    return jnp.array(
        [tok.TIME_B_START] * 4
        + [tok.PRICE_B_START, tok.PRICE_B_START, tok.SIZE_B_START,
           tok.SIZE_B_START] * 2 * n_levels)


def tokenize_book(tok: TokenizerConfig, lob_state_before, time):
    """Pre-step L2 book tokens: 84 = (2 time + 40 L2 fields) x 2 halves
    (reference :2928-2948)."""
    with_time = jnp.concatenate(
        [jnp.stack([time[0], time[1]]),
         lob_state_before]).astype(jnp.int32)
    halves = jax.lax.bitcast_convert_type(with_time, jnp.uint16).reshape(-1)
    n_levels = lob_state_before.shape[0] // 4
    return halves.astype(jnp.uint32) + _book_shift(tok, n_levels)


def tokenize_observation(tok: TokenizerConfig, world_state, total_msgs,
                         old_mid_price, lob_state_before):
    """Full observation: [book tokens, message tokens] (reference :2955)."""
    book = tokenize_book(tok, lob_state_before, world_state.time)
    msgs = tokenize_messages(tok, total_msgs, world_state.best_bids,
                             world_state.best_asks, old_mid_price)
    return jnp.concatenate([book, msgs], axis=0)


# --------------------------------------------------------------------------- #
# Inverses (round-5): the vocabulary bands are lossless for the encoded
# values — every 16-bit half sits in its own band, so subtracting the band
# offset and re-assembling the halves recovers each int32 field bit-exactly
# (including negatives, whose masked halves reassemble through a uint32
# bitcast). tests/test_agent_spaces.py::test_tokenizer_roundtrip_bit_exact
# pins detokenize(tokenize(x)) == x.
# The reference has no decoder at all (its tokenizer path cannot even run,
# mm_env.py:143-144).
# --------------------------------------------------------------------------- #

def _join_halves(low, high):
    u = (low.astype(jnp.uint32) & 0xFFFF) | \
        ((high.astype(jnp.uint32) & 0xFFFF) << 16)
    return jax.lax.bitcast_convert_type(u, jnp.int32)


def detokenize_messages(tok: TokenizerConfig, toks):
    """Inverse of tokenize_messages: 13 tokens/message -> the encoded
    fields. Returns a dict with event (0-4), direction_bit (1 = bid),
    order_id, price_ticks (= price // tick), size, delta_time_s,
    delta_time_ns, delta_price_ticks — each bit-exact."""
    t = toks.reshape(-1, 13).astype(jnp.uint32)
    ed = (t[:, 0] - tok.EVENT_START).astype(jnp.int32)
    # event-dir token = dir_bit*4 + event with event in {1..4} for active
    # rows and 0 for no-op rows (which always carry dir_bit 0), so the
    # in-domain alphabet is {0..8} and token 4 is unambiguously (ask,
    # type 4)
    out = {
        "event": jnp.where(ed == 0, 0, (ed - 1) % 4 + 1),
        "direction_bit": jnp.where(ed == 0, 0, (ed - 1) // 4),
        "order_id": _join_halves(t[:, 1] - tok.ORDER_ID_B_START,
                                 t[:, 2] - tok.ORDER_ID_B_START),
        "price_ticks": _join_halves(t[:, 3] - tok.PRICE_B_START,
                                    t[:, 4] - tok.PRICE_B_START),
        "size": _join_halves(t[:, 5] - tok.SIZE_B_START,
                             t[:, 6] - tok.SIZE_B_START),
        "delta_time_s": _join_halves(t[:, 7] - tok.TIME_B_START,
                                     t[:, 8] - tok.TIME_B_START),
        "delta_time_ns": _join_halves(t[:, 9] - tok.TIME_B_START,
                                      t[:, 10] - tok.TIME_B_START),
        "delta_price_ticks": _join_halves(t[:, 11] - tok.PRICE_B_START,
                                          t[:, 12] - tok.PRICE_B_START),
    }
    return out


def detokenize_book(tok: TokenizerConfig, toks, n_levels: int):
    """Inverse of tokenize_book: 2*(2 + 4*n_levels) tokens -> (time[2],
    lob_state[4*n_levels]), bit-exact."""
    halves = (toks.astype(jnp.uint32)
              - _book_shift(tok, n_levels)).astype(jnp.uint16)
    vals = _join_halves(halves.reshape(-1, 2)[:, 0],
                        halves.reshape(-1, 2)[:, 1])
    return vals[:2], vals[2:]
