"""Generate a realistic multi-day LOBSTER-format dataset.

Produces {out}/rawLOBSTER/{stock}/{period}/{stock}_message_{d}.csv +
matching _orderbook_{d}.csv pairs that exercise the FULL loader path
(parse -> preprocess/merge -> windowing -> npz cache -> pre-reset pickles)
at real-data scale (reference file format: LOBSTER message files, consumed
by lobster_loader.py:626-695).

Realism over the test fixtures (tests/reference_env.py:write_lobster_csvs):
  * mid price follows an intraday random walk with volatility clustering
    (GARCH-ish regime scaling), one walk per day, day-over-day carryover;
  * full trading day 34200-57600 with exponential inter-arrival gaps and a
    U-shaped intensity profile (busy open/close);
  * order lifecycle: cancels/deletes (types 2/3) reference recently added
    order ids with a geometric age distribution; executions (type 4) hit
    the touch price with the aggressor's direction;
  * limit prices cluster geometrically around the touch, a few cross;
  * the orderbook file carries a coherent L2 ladder bracketing the walk.

Usage:
  python scripts/make_realistic_dataset.py --out /root/repo/runs/dataset \\
      --days 3 --msgs-per-day 1500000 --stock SYN --period 2025
"""
import argparse
import os
import sys

import numpy as np


def make_day(rng, n, p0, tick=100, day_start=34200, day_end=57600):
    # --- timestamps: U-shaped intensity via inverse-cdf warping ----------
    u = np.sort(rng.random(n))
    # warp: denser near 0 and 1 (open/close auctions)
    w = 0.5 * u + 0.5 * (3 * u**2 - 2 * u**3.0)
    w = (u + (u - (3 * u**2 - 2 * u**3))) if False else w  # keep simple warp
    t = day_start + w * (day_end - day_start - 1.0)
    t += rng.random(n) * 1e-6          # break exact ties, keep sorted-ish
    t = np.sort(t)

    # --- mid walk with volatility clustering ------------------------------
    regime = np.abs(np.sin(np.linspace(0, 9 * np.pi, n))) + 0.35
    steps = rng.standard_normal(n) * regime
    mid = p0 + np.round(np.cumsum(steps) * 0.35).astype(np.int64) * tick
    mid = np.maximum(mid, 10 * tick)
    half = tick * (1 + (rng.random(n) < 0.15))          # spread 2-4 ticks
    best_ask = mid + half
    best_bid = mid - half

    # --- message types -----------------------------------------------------
    typ = rng.choice([1, 1, 1, 1, 1, 1, 2, 2, 3, 4, 5],
                     size=n).astype(np.int64)
    direction = rng.choice([-1, 1], n)
    qty = np.maximum(1, rng.geometric(0.02, n)).astype(np.int64)

    # oids: type 1 gets a fresh id; 2/3/4 reference a recent add
    oid = np.zeros(n, np.int64)
    is_add = typ == 1
    add_idx = np.flatnonzero(is_add)
    oid[add_idx] = 10_000 + np.arange(len(add_idx))
    add_count_before = np.cumsum(is_add)                 # adds so far
    lag = rng.geometric(0.01, n)
    ref = np.maximum(add_count_before - lag, 0)
    oid[~is_add] = 10_000 + ref[~is_add]

    # prices: adds cluster geometrically around the same-side touch (some
    # cross by 1-2 ticks); cancels at the referenced order's side of book;
    # executions exactly at the touch being consumed
    off = (rng.geometric(0.45, n) - 2) * tick            # -1tick .. deep
    price = np.where(direction == 1, best_bid - off, best_ask + off)
    exe = typ == 4
    # LOBSTER type-4 direction = side of the *standing* order consumed
    price[exe] = np.where(direction[exe] == 1, best_bid[exe], best_ask[exe])
    price = np.maximum(price, tick)

    msgs = np.stack([t, typ.astype(float), oid.astype(float),
                     qty.astype(float), price.astype(float),
                     direction.astype(float)], axis=1)

    # --- orderbook file: L2 ladder around the walk -------------------------
    levels = 10
    book = np.zeros((n, 4 * levels), np.int64)
    depth_seed = 40 + (rng.random((n, levels)) * 80).astype(np.int64)
    for lv in range(levels):
        book[:, 4 * lv + 0] = best_ask + lv * tick
        book[:, 4 * lv + 1] = depth_seed[:, lv] + 8 * lv
        book[:, 4 * lv + 2] = best_bid - lv * tick
        book[:, 4 * lv + 3] = depth_seed[:, levels - 1 - lv] + 8 * lv
    return msgs, book, int(mid[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/dataset")
    ap.add_argument("--days", type=int, default=3)
    ap.add_argument("--msgs-per-day", type=int, default=1_500_000)
    ap.add_argument("--stock", default="SYN")
    ap.add_argument("--period", default="2025")
    ap.add_argument("--p0", type=int, default=2_000_000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    day_dir = os.path.join(args.out, "rawLOBSTER", args.stock, args.period)
    os.makedirs(day_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    p0 = args.p0
    for d in range(1, args.days + 1):
        msgs, book, p0 = make_day(rng, args.msgs_per_day, p0)
        mpath = os.path.join(day_dir, f"{args.stock}_message_{d}.csv")
        bpath = os.path.join(day_dir, f"{args.stock}_orderbook_{d}.csv")
        np.savetxt(mpath, msgs, delimiter=",",
                   fmt=["%.9f", "%d", "%d", "%d", "%d", "%d"])
        np.savetxt(bpath, book, delimiter=",", fmt="%d")
        print(f"day {d}: {msgs.shape[0]} msgs -> {mpath} (close mid {p0})",
              flush=True)
    print(f"dataset at {args.out} (dataPath for WorldConfig)")


if __name__ == "__main__":
    main()
