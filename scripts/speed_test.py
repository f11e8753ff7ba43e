#!/usr/bin/env python
"""Throughput grid benchmark.

Parity reference: gymnax_exchange/jaxen/Speed_test.py — grid over
{agents-per-type, n_data_msg}, vmapped reset + lax.scan rollout with random
actions, compile-first-then-time, csv output.
"""
import argparse
import csv
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench import _preflight, bench_rollout, build_env


def main():
    ap = argparse.ArgumentParser()
    # defaults = the reference grid at reference fidelity
    # (Speed_test.py:61-80: 4000 envs x 50 steps, agents [1,1]/[5,5]/[10,10],
    # n_data_msg {100, 1}), run on the SHIPPED default engine
    ap.add_argument("--envs", type=int, default=4000)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--agents", type=str, default="1,1;5,5;10,10",
                    help="semicolon-separated agent-count pairs")
    ap.add_argument("--n-data-msg", type=str, default="100,1")
    ap.add_argument("--engine", type=str, default="psort",
                    choices=["exact", "sorted", "psort"])
    ap.add_argument("--trade-cap", type=int, default=0,
                    help="0 = nTrades (fully exact)")
    ap.add_argument("--env-chunks", type=int, default=1,
                    help="sequential env-batch chunks per step "
                         "(bit-identical; see bench.py --env-chunks)")
    ap.add_argument("--out", type=str, default="speed_test_results.csv")
    args = ap.parse_args()

    if not _preflight():
        raise SystemExit("device preflight failed (wedged TPU tunnel? see "
                         "CLAUDE.md) — aborting instead of hanging")

    agent_grid = [tuple(int(x) for x in a.split(","))
                  for a in args.agents.split(";")]
    msg_grid = [int(x) for x in args.n_data_msg.split(",")]

    rows = []
    for n_per_type, n_msg in itertools.product(agent_grid, msg_grid):
        env = build_env(n_data_msg=n_msg, n_per_type=n_per_type,
                        engine=args.engine, trade_capture_cap=args.trade_cap,
                        trade_mode="auto")
        sps, compile_time, runs, _ovf = bench_rollout(
            env, args.envs, args.steps, env_chunks=args.env_chunks)
        row = {
            "agents_per_type": str(n_per_type),
            "n_data_msg": n_msg,
            "num_envs": args.envs,
            "num_steps": args.steps,
            "msgs_per_step": env.num_msgs_per_step,
            "engine": args.engine,
            "trade_cap": args.trade_cap,
            "env_chunks": args.env_chunks,
            "trade_overflow_fired": _ovf,
            "avg_steps_per_sec": round(sps, 1),
            "compile_s": round(compile_time, 1),
            "runs": "|".join(str(round(r, 1)) for r in runs),
        }
        rows.append(row)
        print(row)

    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
