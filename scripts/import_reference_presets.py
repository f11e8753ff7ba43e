"""Import the reference env-config presets value-exactly.

For each JSON under {reference}/config/env_configs/ this loads the preset
through our config IO (unknown keys ignored, missing keys defaulted —
io.py mirrors config_io.py:96-162) and re-serialises it under the same name
in configs/. The result is a *value-exact* import: a same-named repo preset
produces an identical MultiAgentConfig to loading the reference file itself
(asserted here and pinned by tests/test_reference_presets.py).

The previous repo presets (synthetic-data demo variants whose values had
drifted from the reference's — e.g. 2_player_fq_fqc's exec reference_price
mid vs far_touch) live on as configs/*_synth.json.

Usage: python scripts/import_reference_presets.py [--reference DIR]
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jaxmarl_hft_tpu.config.io import load_config, save_config  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs"))
    args = ap.parse_args()

    src_dir = os.path.join(args.reference, "config", "env_configs")
    presets = sorted(glob.glob(os.path.join(src_dir, "*.json")))
    if not presets:
        sys.exit(f"no presets found under {src_dir}")
    for src in presets:
        name = os.path.basename(src)
        cfg = load_config(src)
        dst = os.path.join(args.out, name)
        save_config(cfg, dst)
        # round-trip check: the import must load back value-identical
        assert load_config(dst) == cfg, name
        print(f"imported {name}")


if __name__ == "__main__":
    main()
