"""Synthetic LOBSTER-format market-data generator.

The reference framework requires real LOBSTER CSVs; its only synthetic
tooling is the manual book/message helpers in utils.py:117-299. This module
generates an entire self-consistent trading day *vectorised in numpy* in the
exact flat format the loader produces, so environments, tests and benchmarks
run without any data files.

The generated stream statistically resembles LOBSTER flow: a tick-lattice mid
price following a lazy random walk; limit orders placed 0-9 levels deep;
cancels referencing earlier limit orders (sometimes stale, mirroring how real
windows contain cancels for pre-window orders); type-4 executions crossing
the touch.
"""
from __future__ import annotations

import numpy as np

from .lobster import LoadedData, window_indices


def generate_day(seed: int = 0, *, n_msgs: int = 200_000, tick: int = 100,
                 mid0: int = 2_195_000, n_levels: int = 10,
                 max_quant: int = 50, day_start: int = 34200,
                 day_end: int = 57600) -> tuple[np.ndarray, np.ndarray]:
    """Returns (messages (N, 8) int32, mids (N,) int64).

    Message columns: [type, side, qty, price, tid, oid, time_s, time_ns].
    """
    rng = np.random.default_rng(seed)

    # --- timestamps: uniform-ish arrival over the trading day -------------
    total_ns = (day_end - day_start - 60) * 1_000_000_000
    deltas = rng.exponential(total_ns / n_msgs, n_msgs).astype(np.int64)
    t_abs = day_start * 1_000_000_000 + np.cumsum(deltas)
    t_s = (t_abs // 1_000_000_000).astype(np.int64)
    t_ns = (t_abs % 1_000_000_000).astype(np.int64)

    # --- mid price: lazy random walk on the tick lattice ------------------
    steps = rng.choice([-1, 0, 0, 0, 1], size=n_msgs)
    mid = mid0 + np.cumsum(steps) * tick
    mid = np.clip(mid, mid0 // 2, mid0 * 2)

    # --- types / sides ----------------------------------------------------
    typ = rng.choice([1, 2, 4], size=n_msgs, p=[0.65, 0.25, 0.10])
    side = rng.choice([-1, 1], size=n_msgs)
    level = rng.integers(0, n_levels, size=n_msgs)
    qty = rng.integers(1, max_quant, size=n_msgs)

    half = tick // 2
    price = np.where(side == 1,
                     mid - half - level * tick,
                     mid + half + level * tick)
    price = (price // tick) * tick

    oid = np.arange(n_msgs, dtype=np.int64) + 1000

    # Executions cross the touch: price at/through the opposite best.
    is_exec = typ == 4
    exec_depth = rng.integers(0, 2, size=n_msgs)
    exec_price = np.where(side == 1,
                          mid - half + exec_depth * tick,
                          mid + half - exec_depth * tick)
    price = np.where(is_exec, (exec_price // tick) * tick, price)

    # Cancels reference an earlier limit order (lagged), inheriting its
    # oid/price/side; stale references are left bogus on purpose.
    is_cancel = typ == 2
    lag = rng.integers(1, 400, size=n_msgs)
    ref = np.maximum(np.arange(n_msgs) - lag, 0)
    ref_is_limit = typ[ref] == 1
    use_ref = is_cancel & ref_is_limit
    price = np.where(use_ref, price[ref], price)
    side = np.where(use_ref, side[ref], side)
    oid_out = np.where(use_ref, oid[ref], oid)
    qty = np.where(use_ref, np.maximum(1, qty[ref] // 2), qty)

    msgs = np.stack([typ, side, qty, price, oid_out, oid_out, t_s, t_ns],
                    axis=1).astype(np.int32)
    return msgs, mid


def l2_snapshot_at(mid: int, *, tick: int = 100, n_levels: int = 10,
                   seed: int = 0) -> np.ndarray:
    """Interleaved [ask_p, ask_q, bid_p, bid_q]*levels snapshot around mid."""
    rng = np.random.default_rng(seed)
    half = tick // 2
    out = np.empty(4 * n_levels, dtype=np.int64)
    for lvl in range(n_levels):
        out[4 * lvl + 0] = ((mid + half + lvl * tick) // tick) * tick
        out[4 * lvl + 1] = rng.integers(50, 400)
        out[4 * lvl + 2] = ((mid - half - lvl * tick) // tick) * tick
        out[4 * lvl + 3] = rng.integers(50, 400)
    return out


def generate_loaded_data(seed: int = 0, *, n_msgs: int = 200_000,
                         n_levels: int = 10, ep_type: str = "fixed_steps",
                         episode_time: int = 64, window_resolution: int = 64,
                         n_data_msg_per_step: int = 100,
                         day_start: int = 34200, day_end: int = 57600,
                         tick: int = 100) -> LoadedData:
    """Full synthetic day in the loader's output format."""
    msgs, mids = generate_day(seed, n_msgs=n_msgs, tick=tick,
                              n_levels=n_levels, day_start=day_start,
                              day_end=day_end)
    starts, ends = window_indices(
        msgs.shape[0], ep_type=ep_type, episode_time=episode_time,
        window_resolution=window_resolution,
        n_data_msg_per_step=n_data_msg_per_step,
        day_start=day_start, day_end=day_end, times_s=msgs[:, 6])
    books = np.stack([
        l2_snapshot_at(int(mids[s]), tick=tick, n_levels=n_levels,
                       seed=seed + 17 * i)
        for i, s in enumerate(starts)
    ], axis=0)
    return LoadedData(msgs, starts, ends, books, ends - starts)
