"""Import harness for the UPSTREAM reference environment stack.

The reference's env layer (marl_env / mm_env / exec_env / base_env) imports
`gymnax` and `wandb`, neither of which is installed here; both are used only
trivially (a base class with no behavior on the hot path, and one unused
`from wandb import agent`). This module installs minimal stubs, puts
/root/reference on sys.path, and exposes constructors — giving the test
suite a *live end-to-end oracle*: the reference MARLEnv running on the same
synthetic LOBSTER CSVs as ours.

Everything degrades to pytest.skip when the reference mount is absent.
"""
import os
import sys
import types

import numpy as np

REFERENCE_PATH = os.environ.get("REFERENCE_PATH", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "gymnax_exchange"))


def _install_stubs():
    _install_wandb_stub()
    if "gymnax" in sys.modules:
        return

    # ---- gymnax ---------------------------------------------------------
    gymnax = types.ModuleType("gymnax")
    environments = types.ModuleType("gymnax.environments")
    environment = types.ModuleType("gymnax.environments.environment")
    spaces = types.ModuleType("gymnax.environments.spaces")

    class Environment:
        """Minimal stand-in for gymnax.environments.environment.Environment.
        The reference's BaseLOBEnv only uses it as a base class; its generic
        reset/step wrappers are not on the MARLEnv path."""

        def __init__(self):
            pass

        @property
        def default_params(self):  # overridden by BaseLOBEnv
            raise NotImplementedError

    class Space:
        def sample(self, key):
            raise NotImplementedError

    class Discrete(Space):
        def __init__(self, num_categories, dtype=None):
            self.n = num_categories
            self.dtype = dtype

    class Box(Space):
        def __init__(self, low, high, shape=None, dtype=None):
            self.low, self.high, self.shape, self.dtype = (low, high, shape,
                                                           dtype)

    class Dict(Space):
        def __init__(self, spaces_):
            self.spaces = spaces_

    class Tuple(Space):
        def __init__(self, spaces_):
            self.spaces = spaces_

    class MultiDiscrete(Space):
        def __init__(self, nvec, dtype=None):
            self.nvec = nvec
            self.dtype = dtype

    environment.Environment = Environment
    environment.EnvParams = object
    environment.EnvState = object
    for cls in (Discrete, Box, Dict, Tuple, MultiDiscrete, Space):
        setattr(spaces, cls.__name__, cls)

    environments.environment = environment
    environments.spaces = spaces
    gymnax.environments = environments
    sys.modules["gymnax"] = gymnax
    sys.modules["gymnax.environments"] = environments
    sys.modules["gymnax.environments.environment"] = environment
    sys.modules["gymnax.environments.spaces"] = spaces


def _install_wandb_stub():
    # reference utils.py does `from wandb import agent`
    if "wandb" not in sys.modules:
        wandb = types.ModuleType("wandb")
        wandb.agent = None
        wandb.init = lambda *a, **k: None
        wandb.log = lambda *a, **k: None
        sys.modules["wandb"] = wandb


def import_reference_env():
    """Returns the reference modules (marl_env, base_env, jaxob_config)."""
    _install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import gymnax_exchange.jaxen.marl_env as ref_marl  # noqa: E402
    import gymnax_exchange.jaxob.jaxob_config as ref_cfg  # noqa: E402
    return ref_marl, ref_cfg


# --------------------------------------------------------------------------
# Shared synthetic LOBSTER CSV data
# --------------------------------------------------------------------------

def write_lobster_csvs(root, stock="TEST", period="2024", seed=0, n=2500,
                       levels=10, p0=2_000_000, day_start=34200):
    """Generate a coherent LOBSTER message/orderbook CSV pair under
    {root}/rawLOBSTER/{stock}/{period}/ and return the directory.

    The book columns only matter at window starts (init L2 snapshot); the
    message stream is a plausible mix of types 1/2/4/5 around a mid that the
    init book brackets. The same files are consumed by the reference loader
    and ours, so every downstream array must match bit-for-bit.
    """
    rng = np.random.default_rng(seed)
    day_dir = os.path.join(root, "rawLOBSTER", stock, period)
    os.makedirs(day_dir, exist_ok=True)

    t = np.sort(day_start + rng.random(n) * 1200.0)
    typ = rng.choice([1, 1, 1, 1, 2, 3, 4, 5], size=n)
    oid = rng.integers(10_000, 99_999, n)
    qty = rng.integers(1, 100, n)
    direction = rng.choice([-1, 1], n)
    # prices: buys below/at mid, sells above/at mid, +- noise so some cross
    offs = rng.integers(-3, 8, n) * 100
    price = np.where(direction == 1, p0 - offs, p0 + 100 + offs)
    msgs = np.stack([t, typ, oid, qty, price, direction], axis=1)

    # orderbook file: row i = post-message-i L2 snapshot
    # [ask_p, ask_q, bid_p, bid_q] x levels. Only rows before window starts
    # are read (shifted by one for pre-message state).
    book = np.zeros((n, 4 * levels), np.int64)
    for lv in range(levels):
        book[:, 4 * lv + 0] = p0 + 100 * (lv + 1)
        book[:, 4 * lv + 1] = 50 + 10 * lv
        book[:, 4 * lv + 2] = p0 - 100 * lv
        book[:, 4 * lv + 3] = 60 + 10 * lv
    np.savetxt(os.path.join(day_dir, f"{stock}_message_1.csv"), msgs,
               delimiter=",", fmt=["%.9f"] + ["%d"] * 5)
    np.savetxt(os.path.join(day_dir, f"{stock}_orderbook_1.csv"), book,
               delimiter=",", fmt="%d")
    return day_dir


def make_reference_env(data_root, at_root, *, stock="TEST", period="2024",
                       episode_time=8, start_resolution=8,
                       n_data_msg_per_step=10, window_selector=0,
                       mm_overrides=None, exec_overrides=None,
                       world_overrides=None, n_per_type=(1, 1), key=None):
    """Construct the reference MARLEnv over the CSVs at data_root."""
    import jax

    ref_marl, ref_cfg = import_reference_env()

    world_kwargs = dict(
        n_data_msg_per_step=n_data_msg_per_step,
        window_selector=window_selector,
        ep_type="fixed_steps",
        episode_time=episode_time,
        start_resolution=start_resolution,
        dataPath=data_root,
        alphatradePath=at_root,
        stock=stock,
        timePeriod=period,
    )
    world_kwargs.update(world_overrides or {})
    world = ref_cfg.World_EnvironmentConfig(**world_kwargs)
    agents = {}
    if mm_overrides is not None:
        agents["MarketMaking"] = ref_cfg.MarketMaking_EnvironmentConfig(
            **mm_overrides)
    if exec_overrides is not None:
        agents["Execution"] = ref_cfg.Execution_EnvironmentConfig(
            **exec_overrides)
    if not agents:  # default 2-player
        agents = {"MarketMaking": ref_cfg.MarketMaking_EnvironmentConfig(),
                  "Execution": ref_cfg.Execution_EnvironmentConfig()}
    ma = ref_cfg.MultiAgentConfig(
        world_config=world,
        dict_of_agents_configs=agents,
        number_of_agents_per_type=list(n_per_type))
    if key is None:
        key = jax.random.PRNGKey(0)
    return ref_marl.MARLEnv(key, multi_agent_config=ma)
