"""Environment state and parameter pytrees.

Parity reference: gymnax_exchange/jaxen/StatesandParams.py. Same fields and
nesting so trajectories/checkpoints are structurally comparable; agent params
are arrays over agent instances (the vmap axis).
"""
from __future__ import annotations

from typing import Any, List

import chex
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LoadedEnvState:
    """Book + replay-cursor state loaded per window (reference :14-23)."""
    ask_raw_orders: chex.Array
    bid_raw_orders: chex.Array
    trades: chex.Array
    init_time: chex.Array
    window_index: int
    max_steps_in_episode: int
    start_index: int
    step_counter: int


@struct.dataclass
class WorldState(LoadedEnvState):
    """Adds the per-step rolling best-price history and counters
    (reference :27-37)."""
    best_bids: jnp.ndarray     # (num_msgs_per_step, 2)
    best_asks: jnp.ndarray
    time: chex.Array
    order_id_counter: int      # counts downward (negative ids)
    mid_price: float
    delta_time: float


@struct.dataclass
class MultiAgentState:
    world_state: WorldState
    agent_states: List[Any]


@struct.dataclass
class MMEnvState:
    """(reference :48-54)"""
    posted_distance_bid: int
    posted_distance_ask: int
    inventory: int
    total_PnL: float
    cash_balance: float


@struct.dataclass
class ExecEnvState:
    """(reference :57-74)"""
    init_price: int
    task_to_execute: int
    quant_executed: int
    is_sell_task: int
    p_vwap: float
    total_revenue: float
    drift_return: float
    advantage_return: float
    slippage_rm: float
    price_adv_rm: float
    price_drift_rm: float
    vwap_rm: float
    trade_duration: float


@struct.dataclass
class LoadedEnvParams:
    """(reference :87-91)"""
    message_data: chex.Array
    book_data: chex.Array
    init_states_array: Any


@struct.dataclass
class MultiAgentParams:
    """(reference :97-105)"""
    loaded_params: LoadedEnvParams
    agent_params: List[Any]


@struct.dataclass
class MMEnvParams:
    """(reference :108-113); leaves are (n_agents,) arrays."""
    trader_id: chex.Array
    time_delay_obs_act: chex.Array
    normalize: chex.Array


@struct.dataclass
class ExecEnvParams:
    """(reference :116-123)"""
    trader_id: chex.Array
    task_size: chex.Array
    reward_lambda: chex.Array
    time_delay_obs_act: chex.Array
    normalize: chex.Array
