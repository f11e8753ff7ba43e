#!/usr/bin/env python
"""Generate golden engine outputs by running the *upstream reference*
implementation on fixed message streams. The resulting .npz files make the
bit-equivalence tests standalone (no reference mount required at test time).

Run (requires the reference at /root/reference or $REFERENCE_PATH):
    JAX_PLATFORMS=cpu python scripts/generate_goldens.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from jaxmarl_hft_tpu.config.structs import LobConfig
from reference_oracle import (get_oracle, init_book_messages,
                              random_message_stream)

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")


def main():
    job = get_oracle()
    assert job is not None, "reference unavailable"
    os.makedirs(OUT_DIR, exist_ok=True)
    cfg = LobConfig()
    for seed in range(6):
        rng = np.random.default_rng(seed)
        init = init_book_messages(rng)
        msgs = np.concatenate([init, random_message_stream(rng, 300)],
                              axis=0).astype(np.int32)
        state = ((jnp.full((cfg.nOrders, 6), -1, jnp.int32)),
                 (jnp.full((cfg.nOrders, 6), -1, jnp.int32)),
                 (jnp.full((cfg.nTrades, 8), -1, jnp.int32)))
        key = jax.random.PRNGKey(0)
        asks, bids, trades = job.scan_through_entire_array(
            cfg, key, jnp.asarray(msgs), state)
        _, (ba, bb) = job.scan_through_entire_array_save_bidask(
            cfg, key, jnp.asarray(msgs), state, 64)
        l2 = job.get_L2_state(asks, bids, 10, cfg)
        np.savez_compressed(
            os.path.join(OUT_DIR, f"engine_golden_{seed}.npz"),
            msgs=msgs, asks=np.asarray(asks), bids=np.asarray(bids),
            trades=np.asarray(trades), bestasks=np.asarray(ba),
            bestbids=np.asarray(bb), l2=np.asarray(l2))
        print(f"golden {seed} written")


if __name__ == "__main__":
    main()
