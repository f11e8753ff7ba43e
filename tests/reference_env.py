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


# --------------------------------------------------------------------------
# Record/replay cache for live-oracle episodes
#
# The live-oracle tests dominate `make test` wall clock: every combo builds
# the reference env (pandas loader + Python reset-state loops) and compiles
# its step. The reference is FROZEN upstream code, so its outputs for a
# fixed input stream are constants — exactly what golden files already
# capture for the engine. This layer memoises reference reset/step outputs
# content-addressed by a digest of the call inputs (key, actions, and the
# full pre-step state), so replay is order-independent and works under -k
# selection as long as the chain starts at a recorded reset. Our side of
# every comparison always recomputes live.
#
#   * cache files: tests/golden/oracle_cache/<tag>_<confighash>.npz
#     (trajio trees, git-tracked like the other goldens);
#   * ORACLE_LIVE=1 forces live recomputation (and re-records);
#   * a missing digest fails with a regeneration hint (delete the file).
# --------------------------------------------------------------------------

ORACLE_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "golden", "oracle_cache")


class AttrDict(dict):
    """dict with attribute access — replayed stand-in for reference state
    dataclasses (tests only read fields)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def to_plain(obj):
    """Reference pytree -> plain {dict, list, ndarray, None} tree (trajio-
    serialisable; bit-exact leaves)."""
    import dataclasses
    import numpy as np

    if obj is None or isinstance(obj, (str, bytes)):
        return obj
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: to_plain(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if hasattr(obj, "_asdict"):                      # namedtuple
        return {k: to_plain(v) for k, v in obj._asdict().items()}
    if isinstance(obj, dict):
        return {k: to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [to_plain(v) for v in obj]
    return np.asarray(obj)


def _wrap(plain):
    if isinstance(plain, dict):
        return AttrDict({k: _wrap(v) for k, v in plain.items()})
    if isinstance(plain, list):
        return [_wrap(v) for v in plain]
    return plain


def _digest(kind, key, state, actions):
    """Content digest of a reset/step call's inputs. The state enters via
    its to_plain leaves in sorted key-path order, so the digest agrees
    between a live reference state (record) and its replayed AttrDict."""
    import hashlib
    import numpy as np

    h = hashlib.sha1()
    h.update(kind.encode())

    def upd(path, node):
        if isinstance(node, dict):
            for k in sorted(node):
                upd(f"{path}/{k}", node[k])
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                upd(f"{path}/{i}", v)
        elif node is None:
            h.update(f"{path}:None".encode())
        else:
            a = np.asarray(node)
            h.update(f"{path}:{a.dtype}:{a.shape}".encode())
            h.update(a.tobytes())

    upd("key", np.asarray(key))
    if state is not None:
        upd("state", state if isinstance(state, (dict, list)) else
            to_plain(state))
    if actions is not None:
        upd("actions", to_plain(actions))
    return h.hexdigest()


def _config_hash(key_params: dict) -> str:
    """Canonical content hash: json with sort_keys recurses into nested
    override dicts, so two semantically identical scenarios written with
    different key insertion order map to the SAME cache file (advisor
    finding: repr(sorted(items)) only sorted the top level)."""
    import hashlib
    import json
    canon = json.dumps(key_params, sort_keys=True, default=str)
    return hashlib.sha1(canon.encode()).hexdigest()[:10]


def _legacy_config_hash(key_params: dict) -> str:
    """Pre-round-5 hash (top-level sort only); kept so cache files recorded
    under the old scheme keep replaying without a reference mount."""
    import hashlib
    return hashlib.sha1(repr(sorted(key_params.items())).encode()
                        ).hexdigest()[:10]


class _RecordingEnv:
    """Delegates to the live reference env, recording every output.
    The cache file is rewritten at most every 8th call plus once at
    process exit (rewriting the whole compressed npz per call made
    recording O(calls^2) IO — code-review finding)."""

    def __init__(self, env, path, attr_paths=()):
        import atexit

        self._env = env
        self._path = path
        self._calls = {}
        self._attrs = {}
        self._unsaved = 0
        for p in attr_paths:
            node = env
            for part in p.split("."):
                node = getattr(node, part)
            self._attrs[p.replace(".", "~")] = to_plain(node)
        self._save()
        atexit.register(self._flush)

    @property
    def default_params(self):
        return self._env.default_params

    def __getattr__(self, name):
        return getattr(self._env, name)

    def _save(self):
        from jaxmarl_hft_tpu.utils import trajio
        os.makedirs(os.path.dirname(self._path), exist_ok=True)
        trajio.save_traj(self._path,
                         {"attrs": self._attrs, "calls": self._calls})
        self._unsaved = 0

    def _flush(self):
        if self._unsaved:
            self._save()

    def _record(self, digest, out):
        self._calls[digest] = to_plain(list(out))
        self._unsaved += 1
        if self._unsaved >= 8:
            self._save()

    def reset_env(self, key, params):
        out = self._env.reset_env(key, params)
        self._record(_digest("reset", key, None, None), out)
        return out

    def step_env(self, key, state, actions, params):
        d = _digest("step", key, state, actions)
        out = self._env.step_env(key, state, actions, params)
        self._record(d, out)
        return out


class _ReplayEnv:
    """Replays recorded reference outputs; never touches the reference."""

    def __init__(self, path, tree):
        self._path = path
        self._calls = tree["calls"]
        self._attrs = _wrap(tree.get("attrs") or {})

    @property
    def default_params(self):
        return None                      # only ever passed back to us

    def __getattr__(self, name):
        raise AttributeError(
            f"attribute {name!r} was not snapshot into the oracle cache "
            f"({self._path}); add it to attr_paths and regenerate")

    def _lookup(self, d, kind):
        if d not in self._calls:
            raise AssertionError(
                f"oracle cache miss for a {kind} call ({self._path}). The "
                "test inputs changed since the cache was recorded — delete "
                "the file (or set ORACLE_LIVE=1) and rerun with the "
                "reference mount to re-record.")
        return _wrap(self._calls[d])

    def reset_env(self, key, params):
        return self._lookup(_digest("reset", key, None, None), "reset")

    def step_env(self, key, state, actions, params):
        return self._lookup(_digest("step", key, state, actions), "step")


class _CachedAttrEnv(_ReplayEnv):
    def __init__(self, path, tree):
        super().__init__(path, tree)

    def __getattr__(self, name):
        attrs = object.__getattribute__(self, "_attrs")
        # snapshot attr paths use '~' separators ('base_env~messages');
        # expose the first path segment as a nested AttrDict
        top = {k.split("~", 1)[0] for k in attrs}
        if name in top:
            sub = {}
            for k, v in attrs.items():
                parts = k.split("~")
                if parts[0] != name:
                    continue
                node = sub
                for p in parts[1:-1]:
                    node = node.setdefault(p, AttrDict())
                if len(parts) == 1:
                    return v
                node[parts[-1]] = v
            return _wrap(sub) if isinstance(sub, dict) else sub
        return super().__getattr__(name)


def cached_reference_env(tag, key_params, factory, attr_paths=()):
    """Reference env with record/replay caching (see module comment).

    tag: short human-readable cache-file prefix (unique per scenario);
    key_params: every input that determines the env's behaviour (dataset
        seed/size, overrides, episode shape) — hashed into the file name so
        a scenario change can't silently reuse a stale cache;
    factory: zero-arg callable building the LIVE reference env;
    attr_paths: dotted attribute paths to snapshot for tests that compare
        construction-time arrays (e.g. 'base_env.messages')."""
    from jaxmarl_hft_tpu.utils import trajio

    path = os.path.join(ORACLE_CACHE_DIR,
                        f"{tag}_{_config_hash(key_params)}.npz")
    legacy = os.path.join(ORACLE_CACHE_DIR,
                          f"{tag}_{_legacy_config_hash(key_params)}.npz")
    if not os.path.exists(path) and os.path.exists(legacy):
        path = legacy
    if os.environ.get("ORACLE_LIVE") or not os.path.exists(path):
        if not reference_available():
            import pytest
            pytest.skip("no oracle cache recorded and reference mount "
                        f"unavailable ({path})")
        return _RecordingEnv(factory(), path, attr_paths)
    return _CachedAttrEnv(path, trajio.load_traj(path))


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
