"""Data-pipeline and config tests: LOBSTER preprocessing vs the reference's
merge/windowing semantics, synthetic generator integrity, config round-trip,
and loading the reference's own env-config presets."""
import json
import os

import numpy as np
import pytest

from jaxmarl_hft_tpu.config.io import (config_from_dict, config_to_dict,
                                       load_config, save_config)
from jaxmarl_hft_tpu.config.structs import (ExecConfig, MMConfig,
                                            MultiAgentConfig, WorldConfig)
from jaxmarl_hft_tpu.data.lobster import (merge_market_orders,
                                          preprocess_day, window_indices)
from jaxmarl_hft_tpu.data.synthetic import generate_loaded_data


# ------------------------------------------------------------------------- #
# merge_market_orders vs the reference implementation
# ------------------------------------------------------------------------- #

def _reference_merge(msgs):
    """Run the reference's pandas merge (lobster_loader.py:1073-1132) on the
    same data, via the importable reference module."""
    import sys
    sys.path.insert(0, os.environ.get("REFERENCE_PATH", "/root/reference"))
    import importlib
    import pandas as pd
    spec = importlib.util.spec_from_file_location(
        "ref_loader_funcs",
        os.path.join(os.environ.get("REFERENCE_PATH", "/root/reference"),
                     "gymnax_exchange/jaxlobster/lobster_loader.py"))
    # the loader module imports heavy deps at top level; just re-implementing
    # the groupby contract here instead to keep this test hermetic:
    df = pd.DataFrame(msgs, columns=["time_s", "time_ns", "type", "order_id",
                                     "qty", "price", "direction"])
    exec_mask = df["type"] == 4
    result = df.copy()
    drops = []
    for name, group in df[exec_mask].groupby(["time_s", "time_ns",
                                              "direction"]):
        if len(group) > 1:
            gi = group.index.tolist()
            last = gi[-1]
            drops.extend(gi[:-1])
            result.loc[last, "qty"] = group["qty"].sum()
            result.loc[last, "price"] = (group["price"].max()
                                         if name[2] == -1
                                         else group["price"].min())
    if drops:
        result = result.drop(drops)
    return result.to_numpy()


@pytest.mark.parametrize("seed", [0, 1])
def test_merge_market_orders_matches_reference_contract(seed):
    rng = np.random.default_rng(seed)
    n = 500
    t_s = np.sort(rng.integers(34200, 34400, n))
    t_ns = rng.integers(0, 5, n) * 1000  # force timestamp collisions
    typ = rng.choice([1, 2, 4], n, p=[0.4, 0.2, 0.4])
    oid = np.arange(n) + 100
    qty = rng.integers(1, 50, n)
    price = rng.integers(100, 120, n) * 100
    direction = rng.choice([-1, 1], n)
    msgs = np.stack([t_s, t_ns, typ, oid, qty, price, direction], axis=1)
    ours = merge_market_orders(msgs)
    ref = _reference_merge(msgs)
    np.testing.assert_array_equal(ours, ref)


def test_preprocess_day():
    import pandas as pd
    n = 300
    rng = np.random.default_rng(0)
    time = 34200 + np.sort(rng.uniform(0, 1000, n))
    typ = rng.choice([1, 2, 3, 4, 5], n, p=[0.4, 0.2, 0.15, 0.15, 0.1])
    oid = np.arange(n)
    qty = rng.integers(1, 50, n)
    price = rng.integers(100, 120, n) * 100
    direction = rng.choice([-1, 1], n)
    mdf = pd.DataFrame({0: time, 1: typ, 2: oid, 3: qty, 4: price,
                        5: direction})
    bdf = pd.DataFrame(rng.integers(1, 100, (n, 40)))
    msgs, books = preprocess_day(mdf, bdf, 34200, 57600)
    assert msgs.shape[0] == books.shape[0]
    # type 5 dropped, type 3 -> 2
    assert set(np.unique(msgs[:, 0])) <= {1, 2, 4}
    # trader_id column == order_id column
    np.testing.assert_array_equal(msgs[:, 4], msgs[:, 5])
    # book alignment: one fewer row than messages kept (pre-message state)
    assert msgs[:, 6].min() >= 34200


def test_window_indices_fixed_steps():
    starts, ends = window_indices(10_000, ep_type="fixed_steps",
                                  episode_time=8, window_resolution=4,
                                  n_data_msg_per_step=10,
                                  day_start=34200, day_end=57600)
    assert (ends - starts == 80).all()
    assert (np.diff(starts) == 40).all()
    assert ends[-1] <= 10_000


def test_synthetic_loaded_data():
    d = generate_loaded_data(0, n_msgs=20_000, episode_time=8,
                             window_resolution=8, n_data_msg_per_step=10)
    assert d.messages.shape[1] == 8
    assert d.starts.shape == d.ends.shape == d.max_msgs_per_window.shape
    assert d.init_books.shape == (d.starts.shape[0], 40)
    # messages are time-ordered
    t = d.messages[:, 6].astype(np.int64) * 10**9 + d.messages[:, 7]
    assert (np.diff(t) >= 0).all()
    # book snapshots are crossed-free (ask > bid at level 0)
    assert (d.init_books[:, 0] > d.init_books[:, 2]).all()


# ------------------------------------------------------------------------- #
# config round-trip + reference preset loading
# ------------------------------------------------------------------------- #

def test_config_roundtrip(tmp_path):
    cfg = MultiAgentConfig(
        world_config=WorldConfig(n_data_msg_per_step=50, episode_time=32),
        agents=(("MarketMaking", MMConfig(action_space="AvSt")),
                ("Execution", ExecConfig(action_space="twap"))),
        number_of_agents_per_type=(2, 3))
    p = str(tmp_path / "cfg.json")
    save_config(cfg, p)
    cfg2 = load_config(p)
    assert cfg2.world_config.n_data_msg_per_step == 50
    assert cfg2.agent_configs[0].action_space == "AvSt"
    assert cfg2.agent_configs[1].action_space == "twap"
    assert cfg2.number_of_agents_per_type == (2, 3)
    # derived fields recomputed
    assert cfg2.agent_configs[0].n_actions == 8


def test_reference_presets_load():
    """The reference repo's env-config JSON presets load unchanged."""
    ref_dir = os.path.join(os.environ.get("REFERENCE_PATH",
                                          "/root/reference"),
                           "config", "env_configs")
    if not os.path.isdir(ref_dir):
        pytest.skip("reference presets unavailable")
    loaded = 0
    for f in os.listdir(ref_dir):
        if f.endswith(".json"):
            cfg = load_config(os.path.join(ref_dir, f))
            assert isinstance(cfg, MultiAgentConfig)
            loaded += 1
    assert loaded >= 10


def test_own_presets_load():
    """All shipped presets parse; the *_synth demo variants (and only those)
    carry synthetic data — same-named reference imports must keep the
    reference's real-data settings (tests/test_reference_presets.py)."""
    for f in os.listdir("configs"):
        if f.endswith(".json"):
            cfg = load_config(os.path.join("configs", f))
            if f.endswith("_synth.json") or f == "3type_mm_dir_exec.json":
                assert cfg.world_config.synthetic_data, f
            else:
                assert not cfg.world_config.synthetic_data, f


def test_lobster_loader_from_csv_files(tmp_path):
    """End-to-end CSV path of LobsterLoader: write LOBSTER-format message +
    orderbook file pairs, load, check window indexing, and the npz cache
    round trip (reference: run_loading :626-695)."""
    import numpy as np

    from jaxmarl_hft_tpu.data.lobster import LobsterLoader

    rng = np.random.default_rng(0)
    day_dir = tmp_path / "rawLOBSTER" / "TEST" / "2024"
    day_dir.mkdir(parents=True)
    n, levels = 600, 10
    t = np.sort(34200 + rng.random(n) * 600)
    typ = rng.choice([1, 1, 1, 2, 4, 5], size=n)        # type 5 is dropped
    oid = rng.integers(1000, 9999, n)
    qty = rng.integers(1, 100, n)
    price = rng.integers(21900, 22100, n) * 100
    direction = rng.choice([-1, 1], n)
    msgs = np.stack([t, typ, oid, qty, price, direction], axis=1)
    book = np.tile(np.arange(4 * levels), (n, 1)) + 2_000_000
    np.savetxt(day_dir / "TEST_message_10.csv", msgs, delimiter=",",
               fmt=["%.9f"] + ["%d"] * 5)
    np.savetxt(day_dir / "TEST_orderbook_10.csv", book, delimiter=",",
               fmt="%d")

    loader = LobsterLoader(str(tmp_path), str(tmp_path), stock="TEST",
                           time_period="2024", episode_time=4,
                           window_resolution=4, n_data_msg_per_step=10)
    data = loader.run_loading("csvtest")
    assert data.messages.shape[1] == 8
    # dropped type-5 rows and merged same-timestamp executions
    assert data.messages.shape[0] < n
    assert set(np.unique(data.messages[:, 0])).issubset({1, 2, 4})
    assert data.starts.shape == data.ends.shape
    assert (data.ends > data.starts).all()
    assert data.init_books.shape[0] == data.starts.shape[0]

    # second call must hit the npz cache and be identical
    data2 = loader.run_loading("csvtest")
    for a, b in zip(data.astuple(), data2.astuple()):
        np.testing.assert_array_equal(a, b)


def test_all_shipped_presets_build_and_step():
    """Every shipped env-config preset (mirroring the reference's 12,
    config/env_configs/) constructs a MarlEnv and completes a step on
    synthetic data — catches invalid derived defaults (e.g. the inherited
    fixed_prices n_actions) before a user does."""
    import glob as _glob

    import jax
    import jax.numpy as jnp

    from jaxmarl_hft_tpu.config.structs import replace_cfg
    from jaxmarl_hft_tpu.envs.marl import MarlEnv

    cfg_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")
    presets = sorted(_glob.glob(os.path.join(cfg_dir, "*.json")))
    assert len(presets) >= 12
    for path in presets:
        cfg = load_config(path)
        world = replace_cfg(
            cfg.world_config, synthetic_data=True, synthetic_n_msgs=6_000,
            use_pickles_for_init=False, episode_time=4, start_resolution=4,
            n_data_msg_per_step=8,
            ep_type="fixed_steps" if cfg.world_config.ep_type
            not in ("fixed_steps", "fixed_time") else cfg.world_config.ep_type)
        ma = MultiAgentConfig(world_config=world, agents=cfg.agents,
                              number_of_agents_per_type=
                              cfg.number_of_agents_per_type)
        env = MarlEnv(jax.random.PRNGKey(0), ma)
        params = env.default_params
        obs, state = env.reset_env(jax.random.PRNGKey(1), params)
        acts = []
        for i, sp in enumerate(env.action_spaces):
            n = ma.number_of_agents_per_type[i]
            ks = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(2),
                                                     i), n)
            samples = jnp.stack([sp.sample(k) for k in ks])
            acts.append(samples[0] if n == 1 else samples)
        out = env.step_env(jax.random.PRNGKey(3), state, acts, params)
        assert len(out) == 5, os.path.basename(path)


def test_sweep_action_space_swap_rederives_n_actions():
    """Sweeping AGENT_CONFIGS action_space must not inherit the json layer's
    DERIVED fields (a twap-derived n_actions=1 silently shrank a swept
    fixed_prices ladder before)."""
    from jaxmarl_hft_tpu.config.io import config_to_dict, make_agent_configs
    from jaxmarl_hft_tpu.config.structs import ExecConfig

    cfg = MultiAgentConfig(
        world_config=WorldConfig(synthetic_data=True),
        agents=(("Execution", ExecConfig(action_space="twap")),),
        number_of_agents_per_type=(1,))
    d = config_to_dict(cfg)
    d["AGENT_CONFIGS"] = {"Execution": {"action_space": "fixed_prices"}}
    assert make_agent_configs(d)["Execution"].n_actions == 4
    d["AGENT_CONFIGS"] = {"Execution": {"action_space": "fixed_prices",
                                        "n_actions": 2}}
    assert make_agent_configs(d)["Execution"].n_actions == 2
    d["AGENT_CONFIGS"] = {"Execution": {"task_size": 99}}
    a = make_agent_configs(d)["Execution"]
    assert (a.action_space, a.n_actions, a.task_size) == ("twap", 1, 99)


def test_trajio_roundtrip_exact(tmp_path):
    """Nested {dict, list, array, str, None} trees survive the npz
    container bit-for-bit (utils.trajio — shipped trajectory artifacts are
    npz, not pickle)."""
    import numpy as np

    from jaxmarl_hft_tpu.utils import trajio

    tree = {
        "rewards": [np.arange(6, dtype=np.float32).reshape(2, 3),
                    np.ones((2, 3), np.int32) * -7],
        "infos": {"world": {"mid": np.array([1.5, 2.5])},
                  "agents": [{"x": np.zeros(2)}, {"x": np.ones(2)}]},
        "actions": None,
        "dones": {"__all__": np.array([True, False])},
        "combo": "LB",
        "agent_names": ["MarketMaking", "Execution"],
        # adversarial structure: digit-keyed dict (must NOT become a
        # list), empty containers, None inside a list, bytes leaf
        "digit_dict": {"0": np.zeros(1), "1": np.ones(1)},
        "empty_list": [],
        "empty_dict": {},
        "holey": [np.zeros(1), {}, None],
        "raw": b"bytes-leaf",
    }
    path = str(tmp_path / "t.npz")
    trajio.save_traj(path, tree)
    out = trajio.load_traj(path)
    assert out["combo"] == "LB"
    assert out["actions"] is None
    assert out["agent_names"] == ["MarketMaking", "Execution"]
    np.testing.assert_array_equal(out["rewards"][1], tree["rewards"][1])
    np.testing.assert_array_equal(out["infos"]["agents"][1]["x"], np.ones(2))
    np.testing.assert_array_equal(out["dones"]["__all__"],
                                  tree["dones"]["__all__"])
    assert isinstance(out["digit_dict"], dict)
    assert set(out["digit_dict"]) == {"0", "1"}
    assert out["empty_list"] == [] and out["empty_dict"] == {}
    assert out["holey"][1] == {} and out["holey"][2] is None
    assert out["raw"] == b"bytes-leaf"

    # keys that collide with the flat-key encoding must fail loudly at
    # SAVE time, not corrupt the structure at load time
    import pytest
    for bad in ({"a/b": np.zeros(1)}, {"__len__": np.zeros(1)},
                {"__none__": np.zeros(1)}, {"nested": {"__empty_dict__": 1}},
                {3: np.zeros(1)}):
        with pytest.raises(ValueError):
            trajio.save_traj(str(tmp_path / "bad.npz"), bad)
