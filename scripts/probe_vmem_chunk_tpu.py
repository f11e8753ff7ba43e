"""VMEM-chunked env batching + HBM roofline for the psort message scan.

Round-3 localised the psort scan's cost to carried BYTES, not ops (the
deferred-compaction carry removed ~100 vector ops/message and measured
equal-to-slower — BASELINE.md "round 3 records"). The hypothesis here: at
4096 envs the ~SCAN-carry working set exceeds VMEM, so every message pays
HBM roundtrips of the full carry; splitting the env batch into C
sequential chunks (lax.map over a reshaped leading axis) shrinks the
per-chunk carry to VMEM-resident size so all 112 messages of a chunk run
out of VMEM.

Measures, in ONE process/window (CLAUDE.md: cross-window comparisons
mislead):
  1. calibrations: exact/cap16 and psort at C=1 (the recorded 190k/160k
     operating points' isolated-scan equivalents);
  2. psort chunked at C in {2, 4, 8, 16};
  3. analytic carry bytes + achieved effective HBM GB/s per variant;
  4. compiled memory_analysis() for the scan at 2048..8192 envs (the
     real accounting behind the >4096-env cliff, VERDICT Weak #5).

Usage: timeout 5400 python scripts/probe_vmem_chunk_tpu.py [n_envs]
"""
import os
import signal
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import jax
import jax.numpy as jnp
import numpy as np


def bounded(label, seconds, fn):
    def _bail(s, f):
        raise TimeoutError(label)
    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(seconds)
    try:
        return fn()
    finally:
        signal.alarm(0)


def make_match_stream(n_msgs, rng, p0=2_000_000):
    """Bench-like mixed stream (adds + type-4 executions)."""
    rows = []
    for i in range(n_msgs):
        ts, tn = 34200 + i // 100, (i % 100) * 1000
        side = int(rng.integers(0, 2)) * 2 - 1
        if i % 3 == 0:
            rows.append([4, side, int(rng.integers(5, 40)),
                         p0 + (100 if side == -1 else 0), 0, 0, ts, tn])
        else:
            off = int(rng.integers(0, 5)) * 100
            price = p0 - off if side == 1 else p0 + 100 + off
            rows.append([1, side, int(rng.integers(1, 50)), price,
                         10_000 + i, 10_000 + i, ts, tn])
    return np.array(rows, np.int32)


def carry_bytes(cfg, engine_name, n_envs):
    """Analytic scan-carry size (int32 planes only; keys/hist excluded)."""
    nO, nT = cfg.nOrders, cfg.nTrades
    if engine_name == "psort":
        # per side: 6 book planes + refslot P + inverse A1 = 8 x nOrders;
        # trades: 5 planes x nTrades + base scalar
        per_env = 2 * 8 * nO * 4 + 5 * nT * 4 + 4
    elif engine_name == "sorted":
        per_env = 2 * 6 * nO * 4 + 8 * nT * 4
    else:  # exact: 6 planes + rank + cumq per side (+ trades if inscan)
        per_env = 2 * 8 * nO * 4
        if cfg.trade_capture_cap in (0, cfg.nTrades):
            per_env += 5 * nT * 4
    return per_env * n_envs


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_msgs = 112
    HBM_PEAK_GBS = 819.0  # v5e chip HBM bandwidth

    from reference_oracle import init_book_messages
    from jaxmarl_hft_tpu.config.structs import LobConfig, replace_cfg
    from jaxmarl_hft_tpu.lob import engine, engine_sorted

    print(f"device={jax.devices()[0]} envs={n_envs} msgs={n_msgs}",
          flush=True)

    rng = np.random.default_rng(0)
    init_msgs = jnp.asarray(init_book_messages(rng), jnp.int32)
    base_cfg = LobConfig()
    state0 = (engine.init_orderside(base_cfg.nOrders),
              engine.init_orderside(base_cfg.nOrders),
              engine.init_trades(base_cfg.nTrades))
    state0, _ = engine.scan_messages_save_bidask(
        replace_cfg(base_cfg, trade_capture_cap=16), jax.random.PRNGKey(0),
        init_msgs, state0, init_msgs.shape[0])
    state_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_envs,) + x.shape), state0)
    keys = jax.random.split(jax.random.PRNGKey(1), n_envs)
    msgs64 = jnp.asarray(np.stack([
        make_match_stream(n_msgs, np.random.default_rng(100 + e))
        for e in range(min(n_envs, 64))]), jnp.int32)
    msgs = msgs64[np.arange(n_envs) % msgs64.shape[0]]

    N_ITERS = 16

    def timed(label, ecfg, engine_name, chunks, mem_only=False):
        scan = engine_sorted.get_engine(ecfg).scan_messages_save_bidask
        vscan = jax.vmap(lambda k, m, s: scan(ecfg, k, m, s, n_msgs))

        if chunks == 1:
            run_scan = vscan
        else:
            def run_scan(keys, msgs, state):
                resh = lambda x: x.reshape((chunks, x.shape[0] // chunks)
                                           + x.shape[1:])
                args = jax.tree.map(resh, (keys, msgs, state))
                out = jax.lax.map(lambda a: vscan(*a), args)
                return out

        @jax.jit
        def run(keys, msgs, state_b):
            def body(acc, i):
                m = msgs.at[:, 0, 2].add(i % 2)
                out = run_scan(keys, m, state_b)
                leaves = jax.tree.leaves(out)
                s = sum(jnp.sum(l).astype(jnp.int64) for l in leaves)
                return acc + s, None
            acc, _ = jax.lax.scan(body, jnp.int64(0),
                                  jnp.arange(N_ITERS, dtype=jnp.int32))
            return acc

        if mem_only:
            lowered = jax.jit(lambda k, m, s: run_scan(k, m, s)).lower(
                keys, msgs, state_b)
            compiled = bounded(f"{label} compile", 900, lowered.compile)
            ma = compiled.memory_analysis()
            print(f"{label}: temp={ma.temp_size_in_bytes/2**20:.1f}MiB "
                  f"args={ma.argument_size_in_bytes/2**20:.1f}MiB "
                  f"out={ma.output_size_in_bytes/2**20:.1f}MiB "
                  f"peak(gen)={getattr(ma, 'generated_code_size_in_bytes', 0)/2**20:.2f}MiB",
                  flush=True)
            return None

        bounded(f"{label} compile", 900,
                lambda: np.asarray(run(keys, msgs, state_b)))
        dts = []
        for _ in range(3):
            t0 = time.time()
            bounded(f"{label} run", 300,
                    lambda: np.asarray(run(keys, msgs, state_b)))
            dts.append(time.time() - t0)
        dt = min(dts) / N_ITERS
        cb = carry_bytes(ecfg, engine_name, n_envs)
        # effective roundtrips: scan reads+writes the carry once per message
        eff_gbs = 2 * cb * n_msgs / dt / 1e9
        print(f"{label}: {dt*1e3:8.2f} ms/scan  "
              f"carry={cb/2**20:6.1f}MiB  eff={eff_gbs:6.0f} GB/s "
              f"({eff_gbs / HBM_PEAK_GBS:4.2f}x HBM peak) "
              f"runs={[f'{d/N_ITERS*1e3:.1f}' for d in dts]}",
              flush=True)
        return dt

    # 1. calibrations
    cap16 = replace_cfg(base_cfg, matching_engine="exact",
                        trade_capture_cap=16, trade_capture_mode="compressed")
    psort = replace_cfg(base_cfg, matching_engine="psort")
    timed("exact/cap16 C=1 (calib)", cap16, "exact", 1)
    timed("psort      C=1 (calib)", psort, "psort", 1)

    # 2. chunked psort
    for c in (2, 4, 8, 16):
        if n_envs % c:
            continue
        timed(f"psort      C={c}", psort, "psort", c)
    # chunked cap16 for symmetry (is the capped mode also bandwidth-bound?)
    timed("exact/cap16 C=4", cap16, "exact", 4)

    # 3. memory accounting across the batch-size cliff (VERDICT Weak #5)
    for ne in (2048, 4096, 6144, 8192):
        st = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (ne,) + x.shape), state0)
        ks = jax.random.split(jax.random.PRNGKey(1), ne)
        ms = msgs64[np.arange(ne) % msgs64.shape[0]]
        scan = engine_sorted.get_engine(psort).scan_messages_save_bidask
        vscan = jax.vmap(lambda k, m, s: scan(psort, k, m, s, n_msgs))
        try:
            lowered = jax.jit(vscan).lower(ks, ms, st)
            compiled = bounded(f"mem@{ne} compile", 900, lowered.compile)
            ma = compiled.memory_analysis()
            print(f"psort mem@{ne} envs: "
                  f"temp={ma.temp_size_in_bytes/2**20:.1f}MiB "
                  f"args={ma.argument_size_in_bytes/2**20:.1f}MiB "
                  f"out={ma.output_size_in_bytes/2**20:.1f}MiB",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"mem@{ne}: FAILED {e}", flush=True)


if __name__ == "__main__":
    main()
