"""Same-named env presets are value-exact imports of the reference's.

VERDICT r1 found the round-1 flagship preset had drifted from the
reference's values (exec reference_price mid vs far_touch, reward_lambda 0.0
vs 0.1, doom_price_penalty 5 vs 3); the drifted variants now live under
*_synth.json and each same-named preset must produce an identical
MultiAgentConfig to loading the reference file itself
(reference: config/env_configs/*.json; loader parity: config_io.py:96-162).

When /root/reference is not mounted, the same equality is asserted against
recorded golden dicts (tests/golden/reference_presets.json) so the pin also
holds offline.
"""
import glob
import json
import os

import pytest

from jaxmarl_hft_tpu.config.io import config_to_dict, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DIR = "/root/reference/config/env_configs"
GOLDEN = os.path.join(REPO, "tests", "golden", "reference_presets.json")

PRESET_NAMES = [
    "2_player_fq_fqc", "exec_debug", "exec_debug_fixed_price",
    "exec_debug_fixed_quants_complex", "exec_discrete_steps",
    "exec_longrun_fixed_price", "exec_longrun_fixed_quants_complex",
    "exec_longrun_twap", "mm_AvSt", "mm_bobRL", "mm_bobStrategy",
    "mm_debug_fixed_quant",
]


def test_all_reference_presets_are_shipped():
    if os.path.isdir(REF_DIR):
        ref = sorted(os.path.splitext(os.path.basename(p))[0]
                     for p in glob.glob(os.path.join(REF_DIR, "*.json")))
        assert ref == sorted(PRESET_NAMES)
    for name in PRESET_NAMES:
        assert os.path.exists(os.path.join(REPO, "configs", f"{name}.json"))


@pytest.mark.parametrize("name", PRESET_NAMES)
def test_preset_value_exact(name):
    ours = load_config(os.path.join(REPO, "configs", f"{name}.json"))
    if os.path.isdir(REF_DIR):
        ref = load_config(os.path.join(REF_DIR, f"{name}.json"))
        assert ours == ref, f"{name} drifted from the reference preset"
    with open(GOLDEN) as f:
        golden = json.load(f)
    assert config_to_dict(ours) == golden[name], (
        f"{name} drifted from the recorded golden")
