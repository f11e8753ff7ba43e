"""Shared scenario table for the env-level golden files — the single source
of truth for scripts/generate_env_goldens.py (records episodes from the
upstream reference) and tests/test_env_golden.py (replays them through our
stack). Agent entry: (registered name, config kind "MM"|"Exec", override
dict, n_actions, n_instances)."""
import jax.numpy as jnp

SCENARIOS = {
    "env_golden_2p": dict(
        csv_seed=3, episode_steps=8, n_data_msg=10,
        agents=[
            ("MarketMaking", "MM",
             dict(action_space="fixed_quants", observation_space="basic",
                  fixed_quant_value=1), 10, 1),
            ("Execution", "Exec",
             dict(action_space="fixed_quants_complex",
                  observation_space="engineered", task="sell",
                  task_size=100), 13, 1),
        ]),
    "env_golden_2p_alt": dict(
        csv_seed=11, episode_steps=6, n_data_msg=20,
        agents=[
            ("MarketMaking", "MM",
             dict(action_space="spread_skew", observation_space="engineered",
                  reward_function="portfolio_value"), 6, 1),
            ("Execution", "Exec",
             dict(action_space="fixed_quants_1msg", observation_space="basic",
                  task="buy", task_size=200,
                  reward_function="finish_fast"), 5, 1),
        ]),
    # three heterogeneous types, multiple instances of the middle one
    "env_golden_3type": dict(
        csv_seed=13, episode_steps=4, n_data_msg=10,
        agents=[
            ("MarketMaking", "MM",
             dict(action_space="fixed_quants", observation_space="basic",
                  fixed_quant_value=2), 10, 1),
            ("Directional", "MM",
             dict(action_space="directional_trading",
                  observation_space="basic", short_name="DIR",
                  fixed_quant_value=3), 3, 2),
            ("Execution", "Exec",
             dict(action_space="fixed_quants_complex",
                  observation_space="engineered", task="sell",
                  task_size=60), 13, 1),
        ]),
}


def draw_actions(rng, agents):
    """One action per agent type from the shared protocol stream; scalar when
    the type has one instance (the reference trainer's squeezed layout)."""
    acts = []
    for _, _, _, n_actions, n_inst in agents:
        if n_inst == 1:
            acts.append(jnp.asarray(rng.integers(0, n_actions), jnp.int32))
        else:
            acts.append(jnp.asarray(
                rng.integers(0, n_actions, size=(n_inst,)), jnp.int32))
    return acts


def world_fields(ws):
    """WorldState fields compared bit-for-bit (either framework's state)."""
    return {
        "asks": ws.ask_raw_orders, "bids": ws.bid_raw_orders,
        "trades": ws.trades, "best_asks": ws.best_asks,
        "best_bids": ws.best_bids, "time": ws.time,
        "order_id_counter": ws.order_id_counter, "mid_price": ws.mid_price,
        "step_counter": ws.step_counter, "window_index": ws.window_index,
        "start_index": ws.start_index, "delta_time": ws.delta_time,
    }
