"""Host-side LOBSTER data pipeline.

Parity reference: gymnax_exchange/jaxlobster/lobster_loader.py
(LoadLOBSTER_resample, :516-1132). Produces one flat message tensor for all
loaded days plus per-window (start, end) indices and initial L2 book
snapshots:

    messages:     (N, 8) int32  — [type, side, qty, price, tid, oid, t_s, t_ns]
                  (columns 4/5 both carry order_id since LOBSTER has no
                  trader ids; the reference sets trader_id := order_id)
    starts/ends:  (W,)   int64  — episode window slice indices into messages
    init_books:   (W, 4*levels) — L2 snapshot at each window start,
                  interleaved [ask_p, ask_q, bid_p, bid_q] per level
    max_msgs:     (W,)   int64  — messages per window (ends - starts)

Preprocessing steps replicated from the reference (:891-945):
  * split float seconds into (s, ns) int fields
  * drop messages outside [day_start, day_end]
  * keep types {1,2,3,4}; type 3 (delete) -> type 2 (cancel)
  * merge same-timestamp same-direction type-4 executions into one
  * align the book snapshot to the *pre*-message state (shift one row)

Results are cached as compressed .npz keyed by a config-derived suffix.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from glob import glob
from typing import List, Tuple

import numpy as np

MSG_COLUMNS = ["type", "direction", "qty", "price",
               "trader_id", "order_id", "time_s", "time_ns"]


@dataclass
class LoadedData:
    messages: np.ndarray
    starts: np.ndarray
    ends: np.ndarray
    init_books: np.ndarray
    max_msgs_per_window: np.ndarray

    def astuple(self):
        return (self.messages, self.starts, self.ends, self.init_books,
                self.max_msgs_per_window)


def merge_market_orders(msgs: np.ndarray, return_keep: bool = False):
    """Merge consecutive-in-time type-4 executions sharing (time_s, time_ns,
    direction) into a single execution (reference: merge_market_orders
    :1073-1132). Quantities sum; price is max for direction -1 and min for
    direction 1; the last row of each group (its order id) survives.

    ``msgs`` columns: [time_s, time_ns, type, oid, qty, price, direction].
    Vectorised with np.unique instead of the reference's Python groupby loop.
    With ``return_keep`` also returns the surviving row indices, so parallel
    arrays (the book snapshots) can be filtered identically.
    """
    t_s, t_ns, typ, oid, qty, price, direction = msgs.T
    is_exec = typ == 4
    if not is_exec.any():
        return (msgs, np.arange(msgs.shape[0])) if return_keep else msgs

    keys = np.stack([t_s, t_ns, direction], axis=1)
    exec_idx = np.nonzero(is_exec)[0]
    _, group_ids, counts = np.unique(
        keys[exec_idx], axis=0, return_inverse=True, return_counts=True)

    order = np.argsort(group_ids, kind="stable")
    sorted_groups = group_ids[order]
    sorted_rows = exec_idx[order]
    boundaries = np.searchsorted(sorted_groups, np.arange(counts.shape[0]))

    qty_sums = np.add.reduceat(qty[sorted_rows], boundaries)
    prices_sorted = price[sorted_rows]
    dir_per_group = direction[sorted_rows[boundaries]]
    price_max = np.maximum.reduceat(prices_sorted, boundaries)
    price_min = np.minimum.reduceat(prices_sorted, boundaries)
    agg_price = np.where(dir_per_group == -1, price_max, price_min)

    # last row of each group (original order) survives
    last_rows = np.maximum.reduceat(sorted_rows, boundaries)
    keep = np.ones(msgs.shape[0], dtype=bool)
    keep[exec_idx] = False
    keep[last_rows] = True

    out = msgs.copy()
    out[last_rows, 4] = qty_sums
    out[last_rows, 5] = agg_price
    if return_keep:
        return out[keep], np.nonzero(keep)[0]
    return out[keep]


def preprocess_day(message_df, book_df, day_start: int, day_end: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """One day of raw LOBSTER CSVs -> (messages (N,8) int32, books (N, 4L)).

    Raw message columns: [time(float s), type, order_id, qty, price, dir].
    Accepts pandas DataFrames or plain ndarrays (native parser path).
    """
    raw = (message_df.to_numpy() if hasattr(message_df, "to_numpy")
           else np.asarray(message_df))
    time_f = raw[:, 0].astype(np.float64)
    t_s = time_f.astype(np.int64)
    t_ns = ((time_f - t_s) * 1_000_000_000).astype(np.int64)

    typ = raw[:, 1].astype(np.int64)
    oid = raw[:, 2].astype(np.int64)
    qty = raw[:, 3].astype(np.int64)
    price = raw[:, 4].astype(np.int64)
    direction = raw[:, 5].astype(np.int64)

    mask = (t_s >= day_start) & (t_s <= day_end) & np.isin(typ, (1, 2, 3, 4))
    work = np.stack([t_s, t_ns, typ, oid, qty, price, direction],
                    axis=1)[mask]
    books = (book_df.to_numpy() if hasattr(book_df, "to_numpy")
             else np.asarray(book_df))[mask]

    # books must be filtered identically to the messages
    merged, kept_idx = merge_market_orders(work, return_keep=True)
    books = books[kept_idx]

    t_s, t_ns, typ, oid, qty, price, direction = merged.T
    typ = np.where(typ == 3, 2, typ)  # delete -> cancel

    # final layout: [type, direction, qty, price, trader_id, order_id, s, ns]
    msgs = np.stack([typ, direction, qty, price, oid, oid, t_s, t_ns],
                    axis=1).astype(np.int32)

    # align books to the pre-message state: book row i-1 precedes message i
    msgs = msgs[1:]
    books = books[:-1]
    assert msgs.shape[0] == books.shape[0]
    return msgs, books



def window_indices(n_msgs: int, *, ep_type: str, episode_time: int,
                   window_resolution: int, n_data_msg_per_step: int,
                   day_start: int, day_end: int,
                   times_s: np.ndarray | None = None):
    """Episode start/end indices for one day
    (reference: _daily_slice_indeces :971-1002 + _get_inits_day :1004-1071).
    """
    if ep_type == "fixed_steps":
        if n_data_msg_per_step <= 0:
            raise ValueError("n_data_msg_per_step must be positive")
        d_end = n_msgs - episode_time * n_data_msg_per_step
        end_index = (d_end // n_data_msg_per_step) * n_data_msg_per_step + 1
        starts = np.arange(0, end_index,
                           n_data_msg_per_step * window_resolution,
                           dtype=np.int64)
        if starts.shape[0] < 2:
            raise ValueError("Not enough data for a single episode window")
        ends = starts + n_data_msg_per_step * episode_time
        return starts, ends
    elif ep_type == "fixed_time":
        assert times_s is not None
        anchors = np.arange(day_start, day_end + 1, window_resolution)
        starts, ends = [], []
        for a in anchors[:-1]:
            in_win = np.nonzero((times_s >= a) & (times_s < a + episode_time))[0]
            if in_win.shape[0] > 0:
                starts.append(in_win[0])
                ends.append(in_win[-1])
        return (np.asarray(starts, dtype=np.int64),
                np.asarray(ends, dtype=np.int64))
    raise NotImplementedError(f"ep_type {ep_type}")


class LobsterLoader:
    """Multi-day, multi-stock LOBSTER loader with npz caching
    (reference: LoadLOBSTER_resample.run_loading :626-695)."""

    def __init__(self, data_path: str, cache_path: str, *, n_levels: int = 10,
                 ep_type: str = "fixed_steps", episode_time: int = 64,
                 window_resolution: int = 64, n_data_msg_per_step: int = 100,
                 day_start: int = 34200, day_end: int = 57600,
                 stock: str = "AMZN", time_period: str = "2024",
                 use_native: str | bool = "auto"):
        # use_native: True / False / "auto" — parse CSVs with the C++ parser
        # (data/native/lobster_csv.cpp, multithreaded) instead of pandas;
        # "auto" uses it when a toolchain is available. Output arrays are
        # identical either way (see native_csv.py).
        self.use_native = use_native
        self.data_path = data_path
        self.cache_path = cache_path
        self.n_levels = n_levels
        self.ep_type = ep_type
        self.episode_time = episode_time
        self.window_resolution = window_resolution
        self.n_data_msg_per_step = n_data_msg_per_step
        self.day_start = day_start
        self.day_end = day_end
        stocks = [s.strip() for s in str(stock).split(",")]
        periods = [p.strip() for p in str(time_period).split(",")]
        self.message_files: List[str] = []
        self.book_files: List[str] = []
        for s in stocks:
            for p in periods:
                d = os.path.join(data_path, "rawLOBSTER", s, p, "")
                self.message_files += sorted(
                    f for f in glob(d + "*message*.csv") if os.path.getsize(f))
                self.book_files += sorted(
                    f for f in glob(d + "*orderbook*.csv") if os.path.getsize(f))
        self.message_files.sort()
        self.book_files.sort()
        # guard the positional zip below: a missing/empty file on one side
        # would silently shift every later message/book pairing (the
        # reference asserts the same invariant, lobster_loader.py:762-764)
        if len(self.message_files) != len(self.book_files):
            raise FileNotFoundError(
                f"unpaired LOBSTER csvs under {data_path}: "
                f"{len(self.message_files)} message vs "
                f"{len(self.book_files)} orderbook files")
        for mf, bf in zip(self.message_files, self.book_files):
            if os.path.basename(mf).replace("message", "orderbook") \
                    != os.path.basename(bf):
                raise FileNotFoundError(
                    f"mispaired LOBSTER csvs: {os.path.basename(mf)} vs "
                    f"{os.path.basename(bf)}")

    def _resolve_native(self) -> bool:
        if self.use_native is False:
            return False
        from . import native_csv
        if self.use_native is True:
            if not native_csv.available():
                raise RuntimeError("use_native=True but the native CSV "
                                   "parser could not be built")
            return True
        return native_csv.available()

    def _cache_file(self, suffix: str) -> str:
        d = os.path.join(self.cache_path, "saved_npz")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"lobster_{suffix}.npz")

    def run_loading(self, suffix: str = "default") -> LoadedData:
        path = self._cache_file(suffix)
        if os.path.exists(path):
            z = np.load(path)
            return LoadedData(z["msgs"], z["starts"], z["ends"], z["obs"],
                              z["max_msgs"])
        if not self.message_files:
            raise FileNotFoundError(
                f"No LOBSTER csv files under {self.data_path}; "
                "set synthetic_data=True for generated data.")
        native = self._resolve_native()
        if not native:
            import pandas as pd
        all_msgs, all_starts, all_ends, all_obs = [], [], [], []
        offset = 0
        for mf, bf in zip(self.message_files, self.book_files):
            if native:
                from . import native_csv
                mdf = native_csv.parse_messages(mf)
                bdf = native_csv.parse_book(bf)
            else:
                mdf = pd.read_csv(mf, usecols=range(6), header=None,
                                  engine="c", na_filter=False)
                bdf = pd.read_csv(bf, header=None, engine="c",
                                  na_filter=False)
            msgs, books = preprocess_day(mdf, bdf, self.day_start,
                                         self.day_end)
            starts, ends = window_indices(
                msgs.shape[0], ep_type=self.ep_type,
                episode_time=self.episode_time,
                window_resolution=self.window_resolution,
                n_data_msg_per_step=self.n_data_msg_per_step,
                day_start=self.day_start, day_end=self.day_end,
                times_s=msgs[:, 6])
            all_obs.append(books[starts])
            all_starts.append(starts + offset)
            all_ends.append(ends + offset)
            all_msgs.append(msgs)
            offset += msgs.shape[0]
        msgs = np.concatenate(all_msgs, 0)
        starts = np.concatenate(all_starts, 0)
        ends = np.concatenate(all_ends, 0)
        obs = np.concatenate(all_obs, 0)
        max_msgs = ends - starts
        np.savez_compressed(path, msgs=msgs, starts=starts, ends=ends,
                            obs=obs, max_msgs=max_msgs)
        return LoadedData(msgs, starts, ends, obs, max_msgs)
