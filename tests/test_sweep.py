"""Hyperparameter-sweep workflow (scripts/train.py SWEEP_PARAMETERS).

The reference tunes via WandB grid sweeps (ippo_rnn_JAXMARL.py:1168-1274;
grids in config/rl_configs/ippo_rnn_JAXMARL_2player.yaml:69-96). Here the
same {param: {values: [...]}} schema expands to a local cartesian grid run
sequentially or in --sweep-parallel worker processes. These tests pin the
grid expansion, the nested AGENT_CONFIGS override precedence, and the full
CLI path end to end (both sequential and parallel) on tiny synthetic
configs.
"""
import importlib.util
import json
import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TRAIN = os.path.join(_ROOT, "scripts", "train.py")


def _train_mod():
    spec = importlib.util.spec_from_file_location("train_cli", _TRAIN)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_expand_sweep_grid_order():
    t = _train_mod()
    keys, points = t.expand_sweep({
        "LR": {"values": [1e-3, 1e-4]},
        "ENT_COEF": [0.01, 0.001],      # bare-list shorthand also accepted
    })
    assert keys == ["LR", "ENT_COEF"]
    assert points == [(1e-3, 0.01), (1e-3, 0.001),
                      (1e-4, 0.01), (1e-4, 0.001)]


def test_apply_sweep_point_precedence():
    """Swept values override base rl_overrides; a swept AGENT_CONFIGS entry
    rebuilds agent configs through the same three-layer precedence as
    config loading; the env config is untouched otherwise."""
    from jaxmarl_hft_tpu.config.io import load_config
    t = _train_mod()
    ma_cfg = load_config(os.path.join(
        _ROOT, "configs", "exec_longrun_fixed_price_synth.json"))
    base = {"NUM_STEPS": 8, "ENT_COEF": [0.5]}
    keys = ["ENT_COEF", "AGENT_CONFIGS"]
    point = (0.25, {"Execution": {"task_size": 77}})
    cfg, overrides, tag = t.apply_sweep_point(ma_cfg, base, keys, point)
    # swept value wins over the base override; untouched keys survive
    assert overrides["ENT_COEF"] == 0.25
    assert overrides["NUM_STEPS"] == 8
    assert "AGENT_CONFIGS" not in overrides   # consumed by the env layer
    # agent config rebuilt: swept field applied, file-layer fields kept
    exec_cfg = dict(cfg.agents)["Execution"]
    assert exec_cfg.task_size == 77
    assert exec_cfg.action_space == "fixed_prices"
    assert dict(ma_cfg.agents)["Execution"].task_size == 600  # base intact
    assert "task_size" in tag or "AGENT_CONFIGS" in tag
    # a point without AGENT_CONFIGS leaves the env config object untouched
    cfg2, ov2, _ = t.apply_sweep_point(ma_cfg, base, ["ENT_COEF"], (0.1,))
    assert cfg2 is ma_cfg and ov2["ENT_COEF"] == 0.1


def _cpu_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = _ROOT            # drop the axon plugin site
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return env


@pytest.mark.parametrize("parallel", [1, 2])
def test_sweep_cli_end_to_end(tmp_path, parallel):
    """Full CLI: a 2-point LR grid over a tiny synthetic 2-player config,
    sequential and with --sweep-parallel worker processes; every point must
    produce tagged JSONL metrics with finite losses."""
    import yaml
    rl = {
        "NUM_ENVS": 8, "NUM_STEPS": 8, "TOTAL_TIMESTEPS": 8 * 8 * 2,
        "NUM_MINIBATCHES": 2, "UPDATE_EPOCHS": 2,
        "FC_DIM_SIZE": 16, "GRU_HIDDEN_DIM": 16,
        "LR": [2.5e-4, 2.5e-4], "GAMMA": [0.99, 0.99],
        "GAE_LAMBDA": [0.95, 0.95], "ENT_COEF": [0.01, 0.01],
        "VF_COEF": [0.5, 0.5], "MAX_GRAD_NORM": [0.5, 0.5],
        "ANNEAL_LR": [False, False],
        "SWEEP_PARAMETERS": {"LR": {"values": [1e-3, 1e-4]}},
    }
    rl_path = tmp_path / "sweep.yaml"
    rl_path.write_text(yaml.safe_dump(rl))
    log = tmp_path / "sweep.jsonl"
    cmd = [sys.executable, _TRAIN,
           "--env-config",
           os.path.join(_ROOT, "configs", "2_player_fq_fqc_synth.json"),
           "--rl-config", str(rl_path), "--num-updates", "2",
           "--num-envs", "8", "--platform", "cpu",
           "--log-file", str(log)]
    if parallel > 1:
        cmd += ["--sweep-parallel", str(parallel)]
    r = subprocess.run(cmd, env=_cpu_env(), capture_output=True, text=True,
                       timeout=1500, cwd=_ROOT)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    lines = []
    if parallel > 1:
        # parallel mode writes one log per worker: <log>.pointN
        for i in range(2):
            pf = tmp_path / f"sweep.jsonl.point{i}"
            assert pf.exists(), (i, list(tmp_path.iterdir()))
            lines += [json.loads(x) for x in pf.read_text().splitlines()]
    else:
        lines = [json.loads(x) for x in log.read_text().splitlines()]
    tags = {ln["sweep"] for ln in lines}
    assert tags == {"LR=0.001", "LR=0.0001"}, tags
    assert len(lines) == 4                      # 2 points x 2 updates
    import math
    for ln in lines:
        for l in ln["loss"]:
            assert math.isfinite(l["total_loss"])
        assert "trade_overflow_frac" in ln and ln["trade_overflow_frac"] == 0.0
