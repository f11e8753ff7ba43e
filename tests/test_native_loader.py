"""Native C++ CSV parser vs the pandas path: bit-identical arrays.

The native parser (jaxmarl_hft_tpu/data/native/lobster_csv.cpp via ctypes)
replaces only the CSV-read stage of LobsterLoader; everything downstream is
shared numpy code, so proving the parsed arrays equal proves the full
pipeline equal. Covers the LOBSTER quirks: 9-decimal float timestamps,
negative directions, huge placeholder book levels (|v| ~ 1e10 > int32),
trailing columns, \r\n endings, and blank lines.
"""
import os

import numpy as np
import pytest

from jaxmarl_hft_tpu.data import native_csv
from jaxmarl_hft_tpu.data.lobster import LobsterLoader

pytestmark = pytest.mark.skipif(
    not native_csv.available(), reason="no C++ toolchain for native parser")


def _write_day(day_dir, n=600, levels=10, seed=0, line_ending="\n",
               trailing_col=False, blank_lines=False):
    rng = np.random.default_rng(seed)
    day_dir.mkdir(parents=True, exist_ok=True)
    t = np.sort(34190 + rng.random(n) * 700)           # some outside session
    typ = rng.choice([1, 1, 1, 2, 3, 4, 4, 5], size=n)
    oid = rng.integers(1000, 99999, n)
    qty = rng.integers(1, 500, n)
    price = rng.integers(21900, 22100, n) * 100
    direction = rng.choice([-1, 1], n)

    mlines = []
    for i in range(n):
        row = f"{t[i]:.9f},{typ[i]},{oid[i]},{qty[i]},{price[i]},{direction[i]}"
        if trailing_col:
            row += ",junk"
        mlines.append(row)
        if blank_lines and i % 97 == 0:
            mlines.append("")
    (day_dir / "T_message_10.csv").write_bytes(
        (line_ending.join(mlines) + line_ending).encode())

    book = rng.integers(1, 4_000_000, (n, 4 * levels)).astype(np.int64)
    book[:, 4] = -9999999999                           # empty-level sentinel
    book[:, 5] = 9999999999
    blines = [",".join(str(v) for v in row) for row in book]
    (day_dir / "T_orderbook_10.csv").write_bytes(
        (line_ending.join(blines) + line_ending).encode())


def test_parse_messages_matches_pandas(tmp_path):
    import pandas as pd
    _write_day(tmp_path, n=500, seed=1)
    mf = str(tmp_path / "T_message_10.csv")
    ref = pd.read_csv(mf, usecols=range(6), header=None, engine="c",
                      na_filter=False).to_numpy()
    got = native_csv.parse_messages(mf)
    assert got.dtype == np.float64
    np.testing.assert_array_equal(got, ref)
    # float timestamps must be bit-identical, not just close
    assert np.all(got[:, 0].view(np.int64) == ref[:, 0].view(np.int64))


def test_parse_book_matches_pandas(tmp_path):
    import pandas as pd
    _write_day(tmp_path, n=500, seed=2)
    bf = str(tmp_path / "T_orderbook_10.csv")
    ref = pd.read_csv(bf, header=None, engine="c", na_filter=False).to_numpy()
    got = native_csv.parse_book(bf)
    assert got.dtype == np.int64
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("quirk", ["crlf", "trailing", "blank"])
def test_parser_format_quirks(tmp_path, quirk):
    import pandas as pd
    _write_day(tmp_path, n=300, seed=3,
               line_ending="\r\n" if quirk == "crlf" else "\n",
               trailing_col=(quirk == "trailing"),
               blank_lines=(quirk == "blank"))
    mf = str(tmp_path / "T_message_10.csv")
    ref = pd.read_csv(mf, usecols=range(6), header=None, engine="c",
                      na_filter=False).to_numpy()
    got = native_csv.parse_messages(mf)
    np.testing.assert_array_equal(got, ref)


def test_full_loader_native_vs_pandas(tmp_path):
    """End-to-end LobsterLoader over two days: every output array identical
    between the native and pandas read paths (fresh cache each run)."""
    day_dir = tmp_path / "rawLOBSTER" / "T" / "2024"
    _write_day(day_dir, n=600, seed=10)
    os.rename(day_dir / "T_message_10.csv", day_dir / "A_message_10.csv")
    os.rename(day_dir / "T_orderbook_10.csv", day_dir / "A_orderbook_10.csv")
    _write_day(day_dir, n=700, seed=11)

    kw = dict(stock="T", time_period="2024", episode_time=4,
              window_resolution=4, n_data_msg_per_step=10)
    lp = LobsterLoader(str(tmp_path), str(tmp_path / "cp"), use_native=False,
                       **kw)
    ln = LobsterLoader(str(tmp_path), str(tmp_path / "cn"), use_native=True,
                       **kw)
    dp = lp.run_loading("p")
    dn = ln.run_loading("n")
    for a, b in zip(dp.astuple(), dn.astuple()):
        np.testing.assert_array_equal(a, b)


def test_native_parse_speed(tmp_path):
    """The native parser should beat pandas on a bigger file (recorded, not
    asserted tightly — CI boxes vary; assert it is at least not 2x slower)."""
    import time

    import pandas as pd
    _write_day(tmp_path, n=200_000, seed=4)
    mf = str(tmp_path / "T_message_10.csv")
    native_csv.parse_messages(mf)                       # warm (build + cache)
    t0 = time.time()
    native_csv.parse_messages(mf)
    t_native = time.time() - t0
    t0 = time.time()
    pd.read_csv(mf, usecols=range(6), header=None, engine="c",
                na_filter=False).to_numpy()
    t_pandas = time.time() - t0
    print(f"native {t_native*1e3:.1f} ms vs pandas {t_pandas*1e3:.1f} ms "
          f"({t_pandas/max(t_native,1e-9):.1f}x)")
    assert t_native < 2 * t_pandas
