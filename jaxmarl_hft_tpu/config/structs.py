"""Typed, hashable configuration tree.

Parity reference: gymnax_exchange/jaxob/jaxob_config.py. The reference keeps
four frozen dataclasses (JAXLOB_Configuration, World_EnvironmentConfig,
MarketMaking_EnvironmentConfig, Execution_EnvironmentConfig) plus a
MultiAgentConfig container; configs are static jit arguments, so they must be
hashable. We keep the same surface but a single module and explicit derived
fields (n_actions / message counts) computed in __post_init__.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field, fields

from . import constants as cst


@dataclass(frozen=True)
class LobConfig:
    """Matching-engine configuration (reference: jaxob_config.py:12-30)."""
    maxint: int = cst.MAX_INT32
    init_id: int = cst.INIT_ID
    book_depth: int = 10
    cancel_mode: int = cst.CancelMode.INCLUDE_INITS
    type_4_interpretation: int = cst.Type4.IOC
    seed: int = cst.SEED
    nTrades: int = cst.NTRADE_CAP
    nOrders: int = cst.NORDER_CAP
    simulator_mode: int = cst.SimulatorMode.GENERAL_EXCHANGE
    empty_slot_val: int = cst.EMPTY_SLOT
    debug_mode: bool = False
    check_book_fill: bool = True
    start_resolution: int = 6400
    alphatradePath: str = os.path.expanduser("~")
    dataPath: str = os.path.expanduser("~") + "/data"
    stock: str = "AMZN"
    timePeriod: str = "2024_Dec"
    # Engine selection (not in the reference): "psort" (default) keeps each
    # side priority-sorted while carrying the reference slot permutation —
    # bit-parity AND cap-independent exact trade capture, the fastest
    # fully-exact backend (engine_psort.py; every env-level oracle/golden
    # test runs through it); "exact" keeps the reference slot layout with
    # the rank-plane fast matcher (bit-parity, the spec anchor — the
    # engine-level oracle tests drive it directly); "sorted" is the
    # compacted-sorted-side variant (content-equal, not slot-layout-equal).
    matching_engine: str = "psort"
    # Max fills recorded per single message (0 = nTrades, fully exact). The
    # trade buffer itself still holds nTrades rows; capping only bounds how
    # many standing orders a *single* message can log fills against, which
    # shrinks the per-message trade-write matrix from (nTrades, nOrders) to
    # (cap, nOrders). Realistic flow rarely exceeds a handful.
    trade_capture_cap: int = 0
    # Trade-buffer assembly strategy (bit-identical results, perf knob):
    # "auto"       — (default) the measured-fastest strategy for the cap:
    #                "compressed" when cap < nTrades, "inscan" at full
    #                exactness (2x compressed there; BASELINE.md round-2).
    # "compressed" — per-message (cap, nOrders) one-hot extraction into
    #                compressed records + a (nTrades, M, cap) finalize
    #                contraction (cost scales with cap).
    # (a "postscan" mode — buffer rebuilt once per scan from per-slot fill
    # planes via an exact one-hot matmul row-gather — was removed in round
    # 3: bit-identical but 13x slower at production shapes on v5e;
    # BASELINE.md records the negative result. For cap-independent full
    # exactness use the psort engine, which is the default.)
    # "inscan"     — the trade SoA rides in the scan carry and each message
    #                writes its fills via one (nTrades, nOrders) rank-offset
    #                one-hot; no records, no finalize. Bit-identical at
    #                cap = nTrades (gap-slot semantics differ beyond a
    #                smaller cap's contract, as in the sorted engine).
    trade_capture_mode: str = "auto"
    # lax.scan unroll factor for the message scan (semantics-preserving).
    # Measured neutral on v5e at production shapes (scripts/probe_unroll.py:
    # 22.46/22.30/22.29 ms for unroll 1/2/4 at 4096x112) — XLA already keeps
    # the carry planes resident; kept as a knob for other topologies.
    scan_unroll: int = 1


@dataclass(frozen=True)
class WorldConfig(LobConfig):
    """World / data-replay configuration (reference: jaxob_config.py:205-224)."""
    n_data_msg_per_step: int = 1
    window_selector: int = -1          # -1 => random window on reset
    ep_type: str = "fixed_steps"       # fixed_steps | fixed_time
    episode_time: int = 6400           # seconds or steps depending on ep_type
    day_start: int = 34200
    day_end: int = 57600
    tick_size: int = 100
    trader_id_range_start: int = -100
    placeholder_order_id: int = -198
    artificial_trader_id_end_episode: int = -199
    artificial_order_id_end_episode: int = -199
    any_message_obs_space: bool = False
    order_id_counter_start_when_resetting: int = -200
    shuffle_action_messages: bool = True
    # True: shuffle by sorting random keys (fast on TPU, uniform). False:
    # jax.random.permutation, bit-matching the reference's shuffle order.
    shuffle_via_sort: bool = True
    use_pickles_for_init: bool = True
    save_raw_observations: bool = False
    # Non-reference knob: use synthetic data instead of LOBSTER CSVs.
    synthetic_data: bool = False
    synthetic_n_msgs: int = 200_000
    # Domain-validation debug mode (absent upstream — SURVEY §5 "sanitizers:
    # none"): when True, each step checks the combined message stream for
    # the documented out-of-domain corners where psort deliberately diverges
    # from the reference on EMPTY slots (negative-quantity messages,
    # price == -1 on an active type — engine_psort.domain_violations) and
    # surfaces jnp.any(...) as info["world"]["domain_violation"]. Branchless
    # like the overflow certificate; zero cost when False (static flag, the
    # check is never traced).
    validate_messages: bool = False


@dataclass(frozen=True)
class MMConfig:
    """Market-making agent configuration (reference: jaxob_config.py:33-141)."""
    debug_mode: bool = False
    short_name: str = "MM"
    normalize: bool = True
    clip_reward: bool = False
    exclude_extreme_spreads: bool = False

    fixed_action_setting: bool = False
    fixed_action: int = 0
    simple_nothing_action: bool = True
    sell_buy_all_option: bool = False
    based_on_mid_price_of_action: bool = True
    tenth_action: str = "MarketOrder"
    bob_v0: int = 1

    action_space: str = "bobRL"
    observation_space: str = "engineered"
    reward_function: str = "spooner_asym_damped2"

    spread_multiplier: float = 3.0
    skew_multiplier: float = 5.0
    n_ticks_offset: int = 1
    fixed_quant_value: int = 10
    auto_liquidate_threshold: int = 10000
    auto_liquidate_alpha: float = 1.0

    unwind_price_penalty: int = 5
    inv_penalty: str = "none"
    volume_traded_bonus: str = "none"
    reference_price: str = "mid"
    unwind_price: str = "mid"
    inv_penalty_lambda: float = 1.0
    inv_penalty_quadratic_factor: float = 50.0
    inv_penalty_threshold: float = 10.0
    multiplier_type: str = "tick"
    reward_scaling_quo: float = 1.0
    inventoryPnL_eta: float = 0.6
    inventoryPnL_gamma: float = 0.5
    rebate_bps: float = 10.0
    unrealizedPnL_lambda: float = 0.1
    avst_k_parameter: float = 0.4
    avst_var_parameter: float = 1e-8

    time_delay_obs_act: int = 0

    # Derived in __post_init__ from action_space (reference: jaxob_config.py:98-141)
    n_actions: int = 10
    num_messages_by_agent: int = 4
    num_action_messages_by_agent: int = 2

    def __post_init__(self):
        s = object.__setattr__
        a = self.action_space
        if a == "fixed_quants":
            if self.tenth_action == "NA":
                s(self, "n_actions", 9)
            elif self.tenth_action == "MarketOrder":
                s(self, "n_actions", 10)
            else:
                raise ValueError(f"Invalid tenth_action {self.tenth_action}")
            s(self, "num_messages_by_agent", 4)
            s(self, "num_action_messages_by_agent", 2)
        elif a in ("spread_skew", "bobStrategy", "directional_trading", "AvSt", "simple"):
            n = {"spread_skew": 6, "bobStrategy": 5, "directional_trading": 3,
                 "AvSt": 8,
                 "simple": 4 if self.simple_nothing_action else 3}[a]
            s(self, "n_actions", n)
            s(self, "num_messages_by_agent", 4)
            s(self, "num_action_messages_by_agent", 2)
        elif a == "bobRL":
            try:
                s(self, "n_actions", {1: 3, 2: 5, 5: 11, 10: 21}[self.bob_v0])
            except KeyError:
                raise ValueError(f"Invalid bob_v0 {self.bob_v0} for bobRL")
            s(self, "num_messages_by_agent", 4)
            s(self, "num_action_messages_by_agent", 2)
        elif a == "fixed_prices":
            # two-sided ladder: n_actions//2 levels per side, builders handle
            # 1-4 levels, and odd counts would misalign the price/side
            # vectors — derive the full 4+4 ladder unless a valid even count
            # was configured explicitly (the inherited default of 10 is
            # invalid; upstream this space is dead code)
            if self.n_actions % 2 or not 2 <= self.n_actions <= 8:
                s(self, "n_actions", 8)
            s(self, "num_messages_by_agent", self.n_actions * 2)
            s(self, "num_action_messages_by_agent", self.n_actions)
        else:
            raise ValueError(f"Unknown MM action_space {a}")


@dataclass(frozen=True)
class ExecConfig:
    """Execution agent configuration (reference: jaxob_config.py:144-200)."""
    debug_mode: bool = False
    larger_far_touch_quant: bool = False
    normalize: bool = True
    short_name: str = "EXE"
    action_type: str = "pure"

    task: str = "random"               # random | buy | sell
    action_space: str = "fixed_quants_complex"
    observation_space: str = "engineered"
    reward_function: str = "normal"
    task_size: int = 600
    n_ticks_in_book: int = 1
    fixed_quant_value: int = 10
    reward_lambda: float = 0.0
    reward_scaling_quo: float = 1.0
    doom_price_penalty: int = 5
    reference_price: str = "mid"

    time_delay_obs_act: int = 0

    # Derived (reference: jaxob_config.py:175-200)
    n_actions: int = 5
    num_messages_by_agent: int = 8
    num_action_messages_by_agent: int = 4

    def __post_init__(self):
        s = object.__setattr__
        a = self.action_space
        if a == "fixed_quants":
            s(self, "n_actions", 5); s(self, "num_messages_by_agent", 8)
            s(self, "num_action_messages_by_agent", 4)
        elif a == "fixed_prices":
            # the FT/M/NT/PP(+MKT) ladder builders handle 1-4 levels; the
            # inherited dataclass default of 5 is invalid for this space
            # (upstream it silently returns None, exec_env.py:1048-1076 —
            # here it would be a trace-time KeyError), so derive 4 unless a
            # valid count was configured explicitly
            if not 1 <= self.n_actions <= 4:
                s(self, "n_actions", 4)
            s(self, "num_messages_by_agent", self.n_actions * 2)
            s(self, "num_action_messages_by_agent", self.n_actions)
        elif a == "fixed_quants_complex":
            s(self, "n_actions", 13); s(self, "num_messages_by_agent", 8)
            s(self, "num_action_messages_by_agent", 4)
        elif a == "simplest_case":
            s(self, "n_actions", 3); s(self, "num_messages_by_agent", 4)
            s(self, "num_action_messages_by_agent", 2)
        elif a == "fixed_quants_1msg":
            s(self, "n_actions", 5); s(self, "num_messages_by_agent", 2)
            s(self, "num_action_messages_by_agent", 1)
        elif a == "twap":
            s(self, "n_actions", 1); s(self, "num_messages_by_agent", 4)
            s(self, "num_action_messages_by_agent", 2)
        else:
            raise ValueError(f"Unknown Exec action_space {a}")


# Registry for JSON IO / trainer overrides (reference: jaxob_config.py:253-254)
AGENT_CONFIG_CLASSES = {"MarketMaking": MMConfig, "Execution": ExecConfig}


def _freeze_agents(d):
    return tuple(sorted(d.items())) if isinstance(d, dict) else tuple(d)


@dataclass(frozen=True)
class MultiAgentConfig:
    """Container for the world config plus per-agent-type configs
    (reference: jaxob_config.py:228-250).

    Agent configs are stored as a tuple of (type_name, config) pairs so the
    whole tree stays hashable (usable as a static jit argument).
    """
    world_config: WorldConfig = WorldConfig()
    agents: tuple = (("MarketMaking", MMConfig()), ("Execution", ExecConfig()))
    number_of_agents_per_type: tuple = (1, 1)

    def __post_init__(self):
        if isinstance(self.agents, dict):
            object.__setattr__(self, "agents", tuple(self.agents.items()))
        if isinstance(self.number_of_agents_per_type, list):
            object.__setattr__(self, "number_of_agents_per_type",
                               tuple(self.number_of_agents_per_type))
        # reference: jaxob_config.py:245-250 — flip any_message_obs_space if an
        # agent uses a message observation space.
        if any("message" in c.observation_space for _, c in self.agents):
            object.__setattr__(
                self, "world_config",
                replace_cfg(self.world_config, any_message_obs_space=True))

    @property
    def agent_names(self):
        return tuple(n for n, _ in self.agents)

    @property
    def agent_configs(self):
        return tuple(c for _, c in self.agents)


def replace_cfg(cfg, **kwargs):
    """dataclasses.replace that tolerates derived fields."""
    import dataclasses
    return dataclasses.replace(cfg, **kwargs)


def config_fields(cls):
    return {f.name for f in fields(cls)}
