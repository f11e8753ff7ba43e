#!/usr/bin/env python
"""Data-pipeline scale probe: a production-sized LOBSTER day (configurable
rows, default 5M messages ~ a heavy real day) through the full loader —
native C++ parser vs pandas — verifying bit-identical arrays and reporting
wall times for parse / preprocess+window / npz cache save+load.

Usage: timeout 3600 python scripts/probe_loader_scale.py [n_rows]
"""
import os
import shutil
import sys
import tempfile
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np

from reference_env import write_lobster_csvs

from jaxmarl_hft_tpu.data.lobster import LobsterLoader


def run(data_root, cache_root, use_native):
    shutil.rmtree(cache_root, ignore_errors=True)
    loader = LobsterLoader(
        data_root, cache_root, ep_type="fixed_steps", episode_time=64,
        window_resolution=64, n_data_msg_per_step=100, stock="TEST",
        time_period="2024", use_native=use_native)
    t0 = time.time()
    data = loader.run_loading("scale_probe")
    t_load = time.time() - t0
    t0 = time.time()
    data2 = loader.run_loading("scale_probe")   # cache hit
    t_cached = time.time() - t0
    np.testing.assert_array_equal(data.messages, data2.messages)
    return data, t_load, t_cached


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    root = tempfile.mkdtemp(prefix="loader_scale_")
    data_root = os.path.join(root, "data")
    print(f"writing {n:,}-row synthetic LOBSTER day ...", flush=True)
    t0 = time.time()
    write_lobster_csvs(data_root, seed=5, n=n)
    print(f"csv written in {time.time() - t0:.1f}s", flush=True)

    native, t_nat, t_nat_cached = run(data_root,
                                      os.path.join(root, "at_nat"), True)
    pandas_, t_pd, t_pd_cached = run(data_root,
                                     os.path.join(root, "at_pd"), False)
    np.testing.assert_array_equal(native.messages, pandas_.messages)
    np.testing.assert_array_equal(native.init_books, pandas_.init_books)
    np.testing.assert_array_equal(native.starts, pandas_.starts)

    print(f"rows={n:,} windows={native.starts.shape[0]:,} "
          f"messages={native.messages.shape[0]:,}")
    print(f"native : cold {t_nat:6.2f}s  cache-hit {t_nat_cached * 1e3:6.1f}ms")
    print(f"pandas : cold {t_pd:6.2f}s  cache-hit {t_pd_cached * 1e3:6.1f}ms")
    print(f"native/pandas cold speedup: {t_pd / t_nat:.2f}x "
          f"(arrays bit-identical)")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
