"""JSON / YAML config round-trip.

Parity reference: gymnax_exchange/jaxob/config_io.py (load_config_from_file /
save_config_to_file). Uses the same on-disk JSON schema as the reference
env-config presets (config/env_configs/*.json):

    {"world_config": {...},
     "dict_of_agents_configs": {"MarketMaking": {...}, "Execution": {...}},
     "number_of_agents_per_type": [1, 1]}

Unknown keys are ignored (so reference presets load unchanged); missing keys
fall back to dataclass defaults.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict

from .structs import (AGENT_CONFIG_CLASSES, ExecConfig, MMConfig,
                      MultiAgentConfig, WorldConfig, config_fields)


def _filtered(cls, d: Dict[str, Any]):
    known = config_fields(cls)
    return cls(**{k: v for k, v in d.items() if k in known})


def _detect_agent_class(name: str, d: Dict[str, Any]):
    """Pick the agent-config class: by registry name first, else by field
    overlap (reference: config_io.py:96-162 auto-detection)."""
    if name in AGENT_CONFIG_CLASSES:
        return AGENT_CONFIG_CLASSES[name]
    overlaps = {
        cls: len(set(d) & config_fields(cls))
        for cls in (MMConfig, ExecConfig)
    }
    return max(overlaps, key=overlaps.get)


def config_from_dict(d: Dict[str, Any]) -> MultiAgentConfig:
    world = _filtered(WorldConfig, d.get("world_config", {}))
    agents = []
    for name, agent_d in d.get("dict_of_agents_configs", {}).items():
        cls = _detect_agent_class(name, agent_d)
        agents.append((name, _filtered(cls, agent_d)))
    n_per_type = tuple(d.get("number_of_agents_per_type", [1] * len(agents)))
    if not agents:
        return MultiAgentConfig(world_config=world)
    return MultiAgentConfig(world_config=world, agents=tuple(agents),
                            number_of_agents_per_type=n_per_type)


def config_to_dict(cfg: MultiAgentConfig) -> Dict[str, Any]:
    return {
        "world_config": dataclasses.asdict(cfg.world_config),
        "dict_of_agents_configs": {n: dataclasses.asdict(c)
                                   for n, c in cfg.agents},
        "number_of_agents_per_type": list(cfg.number_of_agents_per_type),
    }


def load_config(path: str) -> MultiAgentConfig:
    with open(path) as f:
        if path.endswith((".yaml", ".yml")):
            import yaml
            d = yaml.safe_load(f)
        else:
            d = json.load(f)
    return config_from_dict(d)


def save_config(cfg: MultiAgentConfig, path: str) -> None:
    with open(path, "w") as f:
        json.dump(config_to_dict(cfg), f, indent=2)


def make_agent_configs(config: Dict[str, Any]) -> Dict[str, Any]:
    """Three-layer precedence merge used by the trainer
    (reference: ippo_rnn_JAXMARL.py:387-433 create_agent_configs):
    dataclass defaults < env-config JSON < sweep AGENT_CONFIGS overrides.
    """
    agent_configs = {}
    json_agents = config.get("dict_of_agents_configs", {})
    sweep_agents = config.get("AGENT_CONFIGS", None)
    names = set(json_agents) | set(sweep_agents or {})
    for name in names:
        cls = _detect_agent_class(name, json_agents.get(name, {}))
        known = config_fields(cls)
        overrides = {k: v for k, v in json_agents.get(name, {}).items()
                     if k in known}
        if sweep_agents and name in sweep_agents:
            sweep_over = {k: v for k, v in sweep_agents[name].items()
                          if k in known}
            if "action_space" in sweep_over:
                # the json layer's serialized dict includes __post_init__-
                # DERIVED fields for ITS action space; when the sweep swaps
                # the space those stale values must not be passed as explicit
                # constructor args (a twap-derived n_actions=1 would silently
                # shrink a swept fixed_prices ladder) — drop them unless the
                # sweep sets them itself
                for k in ("n_actions", "num_messages_by_agent",
                          "num_action_messages_by_agent"):
                    if k not in sweep_over:
                        overrides.pop(k, None)
            overrides.update(sweep_over)
        agent_configs[name] = cls(**overrides)
    return agent_configs
