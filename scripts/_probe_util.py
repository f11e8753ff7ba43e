"""Shared helpers for the on-chip probe/benchmark scripts.

The TPU tunnel can wedge so that every program hangs forever (CLAUDE.md);
every device interaction in a probe must be SIGALRM-bounded. Timing must
happen inside one jit (scan of N iterations folded to a scalar checksum):
naive per-call timing through the tunnel includes a flat ~60 ms host-copy
artifact that swamps the signal.
"""
import signal
import time

import jax
import jax.numpy as jnp
import numpy as np


class StageTimeout(Exception):
    pass


def bounded(label, seconds, fn):
    """Run fn() with a SIGALRM watchdog; raises StageTimeout on expiry."""
    def _bail(signum, frame):
        raise StageTimeout(label)
    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(seconds)
    try:
        return fn()
    finally:
        signal.alarm(0)


def timed_scan(label, body_fn, args, n_iters=16, runs=3,
               compile_timeout=900, run_timeout=300):
    """Best-of-`runs` ms for one invocation of body_fn, measured as a
    jit-compiled lax.scan of n_iters calls whose outputs all fold into a
    scalar checksum (defeats DCE; body_fn receives the iteration index and
    must make its computation genuinely depend on it to defeat
    loop-invariant hoisting)."""
    @jax.jit
    def run(args):
        def body(acc, i):
            out = body_fn(i, *args)
            s = sum(jnp.sum(l).astype(jnp.float32)
                    for l in jax.tree.leaves(out))
            return acc + s, None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(n_iters, dtype=jnp.int32))
        return acc

    t0 = time.time()
    bounded(f"{label} compile", compile_timeout,
            lambda: np.asarray(run(args)))
    compile_s = time.time() - t0
    dts = []
    for _ in range(runs):
        t0 = time.time()
        bounded(f"{label} run", run_timeout, lambda: np.asarray(run(args)))
        dts.append(time.time() - t0)
    dt = min(dts) / n_iters
    print(f"{label:36s} {dt * 1e3:8.2f} ms (compile {compile_s:.0f}s)",
          flush=True)
    return dt
