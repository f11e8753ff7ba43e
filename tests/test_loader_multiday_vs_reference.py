"""Multi-day / multi-stock loader equivalence vs the live reference loader.

Covers the cross-file paths the single-day oracle cannot: cumulative
start/end offset adjustment across concatenated days
(lobster_loader.py:664-679), file-pair sorting, and comma-separated
stock/period lists (:568-622).
"""
import os

import numpy as np
import pytest

from reference_env import (REFERENCE_PATH, _install_stubs,
                           reference_available, write_lobster_csvs)

from jaxmarl_hft_tpu.data.lobster import LobsterLoader

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference mount unavailable")


def _reference_loader(data_root, at_root, stock, period, **kw):
    import sys
    _install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from gymnax_exchange.jaxlobster.lobster_loader import LoadLOBSTER_resample
    return LoadLOBSTER_resample(
        data_root, at_root, 10, type_="fixed_steps",
        window_length=kw.get("episode_time", 8),
        n_data_msg_per_step=kw.get("n_data_msg_per_step", 10),
        window_resolution=kw.get("window_resolution", 8),
        day_start=34200, day_end=57600, stock=stock, time_period=period)


def _write_day(root, stock, period, seed, n, fname_idx):
    """A second day file inside the same stock/period directory."""
    import numpy as np
    rng = np.random.default_rng(seed)
    day_dir = os.path.join(root, "rawLOBSTER", stock, period)
    os.makedirs(day_dir, exist_ok=True)
    t = np.sort(34200 + rng.random(n) * 900.0)
    typ = rng.choice([1, 1, 1, 2, 3, 4, 5], size=n)
    oid = rng.integers(10_000, 99_999, n)
    qty = rng.integers(1, 100, n)
    direction = rng.choice([-1, 1], n)
    offs = rng.integers(-3, 8, n) * 100
    p0 = 2_000_000
    price = np.where(direction == 1, p0 - offs, p0 + 100 + offs)
    msgs = np.stack([t, typ, oid, qty, price, direction], axis=1)
    book = np.zeros((n, 40), np.int64)
    for lv in range(10):
        book[:, 4 * lv + 0] = p0 + 100 * (lv + 1)
        book[:, 4 * lv + 1] = 40 + 5 * lv
        book[:, 4 * lv + 2] = p0 - 100 * lv
        book[:, 4 * lv + 3] = 45 + 5 * lv
    np.savetxt(os.path.join(day_dir, f"{stock}_message_{fname_idx}.csv"),
               msgs, delimiter=",", fmt=["%.9f"] + ["%d"] * 5)
    np.savetxt(os.path.join(day_dir, f"{stock}_orderbook_{fname_idx}.csv"),
               book, delimiter=",", fmt="%d")


def _compare(data_root, at_ref, at_ours, stock, period):
    ref = _reference_loader(data_root, at_ref, stock, period)
    r_msgs, r_starts, r_ends, r_obs, r_max = ref.run_loading("multiday")

    ours = LobsterLoader(data_root, at_ours, stock=stock,
                        time_period=period, episode_time=8,
                        window_resolution=8, n_data_msg_per_step=10)
    d = ours.run_loading("multiday")

    np.testing.assert_array_equal(np.asarray(r_msgs),
                                  np.asarray(d.messages))
    np.testing.assert_array_equal(np.asarray(r_starts),
                                  np.asarray(d.starts))
    np.testing.assert_array_equal(np.asarray(r_ends), np.asarray(d.ends))
    np.testing.assert_array_equal(np.asarray(r_obs),
                                  np.asarray(d.init_books))
    np.testing.assert_array_equal(np.asarray(r_max),
                                  np.asarray(d.max_msgs_per_window))
    # window starts strictly increase across the file boundary
    assert (np.diff(np.asarray(d.starts)) > 0).all()


def test_two_days_one_stock(tmp_path):
    data_root = str(tmp_path / "data")
    write_lobster_csvs(data_root, stock="TEST", period="2024", seed=3,
                       n=1500)
    _write_day(data_root, "TEST", "2024", seed=77, n=1200, fname_idx=2)
    _compare(data_root, str(tmp_path / "ra"), str(tmp_path / "oa"),
             "TEST", "2024")


def test_two_stocks_comma_list(tmp_path):
    data_root = str(tmp_path / "data")
    write_lobster_csvs(data_root, stock="AAA", period="2024", seed=5, n=1200)
    write_lobster_csvs(data_root, stock="BBB", period="2024", seed=6, n=1400)
    _compare(data_root, str(tmp_path / "ra"), str(tmp_path / "oa"),
             "AAA,BBB", "2024")
