"""World environment: windowed LOBSTER message replay through the book.

Parity reference: gymnax_exchange/jaxen/base_env.py (BaseLOBEnv). Loads the
flat message tensor once on the host, precomputes one reset state per episode
window by replaying the window's L2 snapshot through the engine, and exposes
jittable `reset_env` / `get_data_messages`.

Design deltas (TPU-first):
  * reset-state precompute is a single vmapped replay over all windows (the
    reference loops in Python over windows, base_env.py:320-327);
  * the synthetic-data path removes the filesystem dependency entirely.
"""
from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp

from ..config.structs import WorldConfig
from ..data.lobster import LobsterLoader
from ..data.synthetic import generate_loaded_data
from ..lob import engine, engine_sorted
from ..utils.tree import index_tree
from .structs import LoadedEnvParams, LoadedEnvState

I32 = jnp.int32


def _filename_suffix(cfg: WorldConfig) -> str:
    """(reference: base_env.py:398-411)"""
    parts = [cfg.stock, cfg.timePeriod, cfg.book_depth, cfg.ep_type,
             cfg.episode_time, cfg.start_resolution, cfg.n_data_msg_per_step,
             cfg.day_start, cfg.day_end]
    if cfg.synthetic_data:
        parts = ["synthetic", cfg.seed, cfg.synthetic_n_msgs] + parts
    return "_".join(str(p) for p in parts)


def _reset_state_suffix(cfg: WorldConfig) -> str:
    """Pickle-cache key for precomputed reset states: the loader suffix plus
    every knob that changes the replayed book arrays (capacities and engine
    backend — repo additions the reference key predates); omitting them
    would silently load stale cached states after a config change."""
    return (f"{_filename_suffix(cfg)}_{cfg.nOrders}_{cfg.nTrades}"
            f"_{cfg.matching_engine}")


def make_initial_orders(cfg: WorldConfig, book_l2: jax.Array,
                        time: jax.Array) -> jax.Array:
    """Init limit-order messages from one L2 snapshot, with the env layer's
    id convention: oid = init_id constant, tid = init_id - arange
    (reference: base_env.py:248-273 — note this differs from the engine-level
    init_msgs_from_l2, which is used by the standalone book wrapper)."""
    n = cfg.book_depth
    data = jnp.asarray(book_l2).reshape(2 * n, 2)
    out = jnp.zeros((2 * n, 8), dtype=I32)
    out = (out
           .at[:, 3].set(data[:, 0])
           .at[:, 2].set(data[:, 1])
           .at[:, 0].set(1)
           .at[0:n * 4:2, 1].set(-1)
           .at[1:n * 4:2, 1].set(1)
           .at[:, 4].set(cfg.init_id)
           .at[:, 5].set(cfg.init_id - jnp.arange(0, 2 * n))
           .at[:, 6].set(time[0])
           .at[:, 7].set(time[1]))
    return out


class WorldEnv:
    """Data-replay world (reference: BaseLOBEnv, base_env.py:84-453)."""

    def __init__(self, cfg: WorldConfig, key):
        self.cfg = cfg
        if cfg.synthetic_data:
            loaded = generate_loaded_data(
                cfg.seed, n_msgs=cfg.synthetic_n_msgs,
                n_levels=cfg.book_depth, ep_type=cfg.ep_type,
                episode_time=cfg.episode_time,
                window_resolution=cfg.start_resolution,
                n_data_msg_per_step=cfg.n_data_msg_per_step,
                day_start=cfg.day_start, day_end=cfg.day_end,
                tick=cfg.tick_size)
        else:
            loader = LobsterLoader(
                cfg.dataPath, cfg.alphatradePath, n_levels=cfg.book_depth,
                ep_type=cfg.ep_type, episode_time=cfg.episode_time,
                window_resolution=cfg.start_resolution,
                n_data_msg_per_step=cfg.n_data_msg_per_step,
                day_start=cfg.day_start, day_end=cfg.day_end,
                stock=cfg.stock, time_period=cfg.timePeriod)
            loaded = loader.run_loading(_filename_suffix(cfg))

        msgs, starts, ends, books, max_msgs = loaded.astuple()
        self.messages = jnp.asarray(msgs, dtype=I32)
        self.books = jnp.asarray(books, dtype=I32)
        self.start_indices = jnp.asarray(starts, dtype=I32)
        self.end_indices = jnp.asarray(ends, dtype=I32)
        self.max_messages_in_episode = jnp.asarray(max_msgs, dtype=I32)
        self.n_windows = int(starts.shape[0])
        self._init_states(key)

    # ------------------------------------------------------------------ #

    def _get_state_from_data(self, key, first_message, book_data,
                             max_steps_in_episode, window_index, start_index
                             ) -> LoadedEnvState:
        """Replay the L2 snapshot into an empty book
        (reference: base_env.py:245-296)."""
        cfg = self.cfg
        time = first_message[-2:]
        init_orders = make_initial_orders(cfg, book_data, time)
        asks = engine.init_orderside(cfg.nOrders)
        bids = engine.init_orderside(cfg.nOrders)
        trades = engine.init_trades(cfg.nTrades)
        scan_fn, _ = engine_sorted.get_scan_fns(cfg)
        asks, bids, trades = scan_fn(cfg, key, init_orders,
                                     (asks, bids, trades))
        if cfg.ep_type == "fixed_time":
            init_time = jnp.stack([
                (window_index * cfg.start_resolution)
                % (cfg.day_end - cfg.day_start - cfg.episode_time
                   + cfg.start_resolution) + cfg.day_start,
                jnp.zeros_like(window_index)]).astype(I32)
        else:
            init_time = time
        return LoadedEnvState(
            ask_raw_orders=asks, bid_raw_orders=bids, trades=trades,
            init_time=init_time, window_index=window_index,
            max_steps_in_episode=max_steps_in_episode,
            start_index=start_index, step_counter=jnp.zeros_like(start_index))

    def _init_states(self, key):
        """Precompute (and cache) a reset state for every window
        (reference: base_env.py:298-333). Computed as one vmapped replay."""
        cfg = self.cfg
        cache = None
        if cfg.use_pickles_for_init and not cfg.synthetic_data:
            d = os.path.join(cfg.alphatradePath, "pre_reset_states")
            os.makedirs(d, exist_ok=True)
            cache = os.path.join(
                d, f"ResetStates_{_reset_state_suffix(cfg)}.pkl")
            if os.path.exists(cache):
                with open(cache, "rb") as f:
                    self.init_states_array = pickle.load(f)
                return

        idx = jnp.arange(self.n_windows, dtype=I32)
        first_msgs = self.messages[self.start_indices]
        max_steps = (self.max_messages_in_episode
                     // cfg.n_data_msg_per_step + 1)
        build = jax.vmap(self._get_state_from_data,
                         in_axes=(None, 0, 0, 0, 0, 0))
        self.init_states_array = jax.jit(build)(
            key, first_msgs, self.books, max_steps, idx, self.start_indices)

        if cache is not None:
            with open(cache, "wb") as f:
                pickle.dump(jax.device_get(self.init_states_array), f)

    # ------------------------------------------------------------------ #

    @property
    def default_params(self) -> LoadedEnvParams:
        return LoadedEnvParams(
            message_data=self.messages,
            book_data=self.books,
            init_states_array=self.init_states_array)

    def reset_env(self, key, params: LoadedEnvParams):
        """Sample (or select) a window and fetch its precomputed state
        (reference: base_env.py:218-234)."""
        idx = jnp.where(
            self.cfg.window_selector == -1,
            jax.random.randint(key, minval=0, maxval=self.n_windows,
                               shape=()),
            jnp.asarray(self.cfg.window_selector, dtype=I32))
        return 0, index_tree(params.init_states_array, idx)

    def step_env(self, key, state: LoadedEnvState, action,
                 params: LoadedEnvParams):
        """Standalone data-only replay step — the action is ignored ("DO
        NOTHING"); the MARL orchestrator does not use this, it exists for
        world-replay experiments (reference: base_env.py:189-216)."""
        cfg = self.cfg
        msgs = self.get_data_messages(
            params.message_data, state.start_index, state.step_counter,
            state.init_time[0] + cfg.episode_time)
        time = msgs[-1, -2:]
        scan_fn, _ = engine_sorted.get_scan_fns(cfg)
        asks, bids, trades = scan_fn(
            cfg, key, msgs,
            (state.ask_raw_orders, state.bid_raw_orders, state.trades))
        state = LoadedEnvState(
            ask_raw_orders=asks, bid_raw_orders=bids, trades=trades,
            init_time=state.init_time, window_index=state.window_index,
            max_steps_in_episode=state.max_steps_in_episode,
            start_index=state.start_index,
            step_counter=state.step_counter + 1)
        done = (time - state.init_time)[0] >= cfg.episode_time
        return 0, state, 0.0, done, {"info": 0}

    def get_data_messages(self, message_data, start, step_counter,
                          end_time_s):
        """Slice this step's data messages; in fixed_time mode, zero messages
        at/after the episode end time (reference: base_env.py:339-369)."""
        cfg = self.cfg
        offset = start + cfg.n_data_msg_per_step * step_counter
        msgs = jax.lax.dynamic_slice_in_dim(
            message_data, offset, cfg.n_data_msg_per_step, axis=0)
        if cfg.ep_type == "fixed_time":
            late = msgs[:, -2] >= end_time_s
            body = jnp.where(late[:, None], jnp.zeros_like(msgs[:, :-2]),
                             msgs[:, :-2])
            msgs = jnp.concatenate((body, msgs[:, -2:]), axis=1,
                                   dtype=I32)
        return msgs
