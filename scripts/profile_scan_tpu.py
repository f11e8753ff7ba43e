#!/usr/bin/env python
"""On-chip profiler trace of the certified message scan (VERDICT r4 item 4).

Captures a jax.profiler trace of the production scan (exact engine, cap 16,
4096 envs x 112 msgs) and prints the top device time sinks, attributing the
measured 0.41-0.54x-of-HBM-peak gap to named ops instead of the standing
"scheduling-bound" inference. Falls back to compiled cost_analysis if the
tunnelled backend emits no device trace events.

Usage: timeout 3600 python scripts/profile_scan_tpu.py [n_envs] [engine]
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _preflight
from probe_vmem_chunk_tpu import make_match_stream


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    engine_name = sys.argv[2] if len(sys.argv) > 2 else "exact"
    n_msgs = 112
    if not _preflight(budget_s=1800):
        print("DEVICE UNAVAILABLE")
        return 1

    from reference_oracle import init_book_messages
    from jaxmarl_hft_tpu.config.structs import LobConfig, replace_cfg
    from jaxmarl_hft_tpu.lob import engine, engine_sorted
    from jaxmarl_hft_tpu.utils import profiling

    cap = 16 if engine_name == "exact" else 0
    ecfg = replace_cfg(LobConfig(), matching_engine=engine_name,
                       trade_capture_cap=cap)
    rng = np.random.default_rng(0)
    init_msgs = jnp.asarray(init_book_messages(rng), jnp.int32)
    state0 = (engine.init_orderside(ecfg.nOrders),
              engine.init_orderside(ecfg.nOrders),
              engine.init_trades(ecfg.nTrades))
    state0, _ = engine.scan_messages_save_bidask(
        ecfg, jax.random.PRNGKey(0), init_msgs, state0, init_msgs.shape[0])
    state_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_envs,) + x.shape), state0)
    keys = jax.random.split(jax.random.PRNGKey(1), n_envs)
    msgs64 = jnp.asarray(np.stack([
        make_match_stream(n_msgs, np.random.default_rng(100 + e))
        for e in range(min(n_envs, 64))]), jnp.int32)
    msgs = msgs64[np.arange(n_envs) % msgs64.shape[0]]

    scan = engine_sorted.get_engine(ecfg).scan_messages_save_bidask
    vscan = jax.jit(jax.vmap(lambda k, m, s: scan(ecfg, k, m, s, n_msgs)))

    print(f"device={jax.devices()[0]} envs={n_envs} engine={engine_name}",
          flush=True)
    out = vscan(keys, msgs, state_b)
    jax.block_until_ready(out)
    out = vscan(keys, msgs, state_b)          # discard first-exec anomaly
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.time()
    N = 8
    for _ in range(N):
        out = vscan(keys, msgs, state_b)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.time() - t0) / N
    print(f"warm scan: {dt*1e3:.1f} ms / {n_envs}x{n_msgs} msgs "
          f"({n_envs*n_msgs/dt/1e6:.1f} M msgs/s)", flush=True)

    log_dir = f"/tmp/jaxtrace_{engine_name}_{n_envs}"
    try:
        with profiling.trace(log_dir):
            for _ in range(4):
                out = vscan(keys, msgs, state_b)
            jax.block_until_ready(out)
        rows = profiling.summarize_trace(log_dir, top=25)
    except Exception as e:  # noqa: BLE001
        print(f"profiler trace failed: {e}", flush=True)
        rows = []
    dev_rows = [r for r in rows if not r[0].startswith(("Thread", "proc"))]
    if dev_rows:
        print("top trace events (name, count, total_ms over 4 iters):")
        for nm, c, ms in dev_rows:
            print(f"  {ms:10.2f} ms  x{c:<6d} {nm[:90]}")
    else:
        print("no trace events captured — cost_analysis fallback:")
    lowered = jax.jit(
        jax.vmap(lambda k, m, s: scan(ecfg, k, m, s, n_msgs))).lower(
        keys, msgs, state_b)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        keys_of_interest = sorted(
            (k, v) for k, v in ca.items()
            if isinstance(v, (int, float)) and v > 0)
        print("compiled cost_analysis:")
        for k, v in keys_of_interest:
            print(f"  {k}: {v:,.0f}")
        by = ca.get("bytes accessed", 0)
        if by:
            print(f"  => effective bandwidth if roofline: "
                  f"{by/dt/1e9:.0f} GB/s achieved vs 819 peak "
                  f"({by/dt/1e9/819:.2f}x)")
    except Exception as e:  # noqa: BLE001
        print(f"cost_analysis failed: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
