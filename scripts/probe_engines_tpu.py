"""One-process engine-backend bench: measures every engine/trade-mode
variant through a single tunnel connection (the relay drops fresh
connections for minutes at a time, so chaining separate bench.py processes
loses the window; one process amortises both the connection and the
preflight).

Prints one line per variant:  name  env-steps/s  (elapsed / compile).
Results are recorded in BASELINE.md round-2 tables.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import build_env, bench_rollout, _preflight  # noqa: E402


def main():
    if not _preflight(budget_s=1800):
        print("DEVICE UNAVAILABLE")
        return 1
    n_envs, n_steps = 4096, 32
    variants = [
        ("exact/compressed cap16 (production)",
         dict(engine="exact", trade_capture_cap=16, trade_mode="compressed")),
        ("psort cap=nTrades (FULLY EXACT)",
         dict(engine="psort", trade_capture_cap=0, trade_mode="compressed")),
        ("sorted cap=nTrades (content-equal)",
         dict(engine="sorted", trade_capture_cap=0, trade_mode="compressed")),
        ("exact/inscan cap=nTrades (round-2 exact leader)",
         dict(engine="exact", trade_capture_cap=0, trade_mode="inscan")),
        ("exact/compressed cap=100 (round-1 exact)",
         dict(engine="exact", trade_capture_cap=100,
              trade_mode="compressed")),
    ]
    for name, kw in variants:
        try:
            env = build_env(n_data_msg=100,
                            engine=kw["engine"],
                            trade_capture_cap=kw["trade_capture_cap"],
                            trade_mode=kw["trade_mode"])
            sps, compile_time, runs, _ovf = bench_rollout(env, n_envs, n_steps)
            print(f"{name}: {sps:,.0f} env-steps/s "
                  f"(runs {[round(r / 1000, 1) for r in runs]}k, "
                  f"compile {compile_time:.1f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — record and continue
            print(f"{name}: FAILED {e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
