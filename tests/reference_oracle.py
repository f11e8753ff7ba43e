"""Access to the upstream reference implementation as a *test oracle*.

The reference repo (read-only at /root/reference) is pure JAX and its engine
module imports standalone. We use it only to verify bit-equivalence of our
TPU-native engine — never as a source of implementation code.
"""
import os
import sys

REFERENCE_PATH = os.environ.get("REFERENCE_PATH", "/root/reference")

_oracle = None


def get_oracle():
    """Returns the reference JaxOrderBookArrays module, or None."""
    global _oracle
    if _oracle is None:
        if not os.path.isdir(REFERENCE_PATH):
            return None
        sys.path.insert(0, REFERENCE_PATH)
        try:
            import gymnax_exchange.jaxob.JaxOrderBookArrays as job
            _oracle = job
        except Exception:
            return None
    return _oracle


def random_message_stream(rng, n_msgs, *, tick=100, mid=2_195_000,
                          n_levels=10, max_quant=50, start_oid=1000):
    """Generate a plausible LOBSTER-style message stream as an
    (n_msgs, 8) int32 numpy array. Types: 1 (limit), 2 (cancel), 4 (exec);
    prices on the tick lattice around a drifting mid; cancels reference
    previously-seen order ids (sometimes stale/bogus)."""
    import numpy as np

    msgs = np.zeros((n_msgs, 8), dtype=np.int32)
    live_oids = []  # (oid, side, price, quant)
    t_s, t_ns = 34200, 0
    oid = start_oid
    for i in range(n_msgs):
        t_ns += int(rng.integers(1, 5_000_000))
        if t_ns >= 1_000_000_000:
            t_s += 1
            t_ns -= 1_000_000_000
        typ = rng.choice([1, 1, 1, 2, 4], p=[0.3, 0.25, 0.15, 0.2, 0.1])
        side = int(rng.choice([-1, 1]))
        level = int(rng.integers(0, n_levels))
        if side == 1:
            price = mid - tick // 2 - level * tick
        else:
            price = mid + tick // 2 + level * tick
        price = (price // tick) * tick
        quant = int(rng.integers(1, max_quant))
        if typ == 2 and live_oids and rng.random() < 0.8:
            j = int(rng.integers(0, len(live_oids)))
            o, s, p, q = live_oids.pop(j)
            msgs[i] = [2, s, max(1, q // 2) if rng.random() < 0.5 else q,
                       p, o, o, t_s, t_ns]
            continue
        elif typ == 2:
            # bogus cancel (unknown id, maybe init-order price)
            msgs[i] = [2, side, quant, price, 77_000_000 + i, 77_000_000 + i,
                       t_s, t_ns]
            continue
        if typ == 1:
            oid += 1
            msgs[i] = [1, side, quant, price, oid, oid, t_s, t_ns]
            live_oids.append((oid, side, price, quant))
            if len(live_oids) > 60:
                live_oids.pop(0)
        else:  # type 4: execution against side `side`'s book
            # aggressive price so it crosses a few levels
            cross = mid + side * tick * int(rng.integers(0, 3))
            cross = (cross // tick) * tick
            oid += 1
            msgs[i] = [4, side, quant, cross, oid, oid, t_s, t_ns]
        # slow mid drift
        if rng.random() < 0.05:
            mid += int(rng.choice([-tick, tick]))
    return msgs


def init_book_messages(rng, *, tick=100, mid=2_195_000, n_levels=10,
                       init_id=-2):
    """L2-snapshot-style init messages mirroring what BaseLOBEnv feeds the
    engine on reset (reference: base_env.py:245-296)."""
    import numpy as np
    rows = []
    for lvl in range(n_levels):
        ask_p = mid + tick // 2 + lvl * tick
        bid_p = mid - tick // 2 - lvl * tick
        ask_q = int(rng.integers(10, 300))
        bid_q = int(rng.integers(10, 300))
        rows.append([1, -1, ask_q, (ask_p // tick) * tick, 0, 0, 34200, 0])
        rows.append([1, 1, bid_q, (bid_p // tick) * tick, 0, 0, 34200, 0])
    msgs = np.array(rows, dtype=np.int32)
    # reference init uses oid=init_id (constant), tid=init_id - arange
    # (base_env.py:263-264)
    msgs[:, 4] = init_id
    msgs[:, 5] = init_id - np.arange(len(rows))
    return msgs
