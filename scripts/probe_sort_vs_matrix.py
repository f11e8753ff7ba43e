"""Microbenchmark: per-message cost of the matcher's prefix-quantity term.

The exact engine computes S_i (crossing quantity with higher priority) via an
(n, n) rank-comparison matrix. The alternative is two stable sorts: sort
(q*crossing) by rank, cumsum, sort back by original slot. Same integers,
different op shape. This probe times both inner ops in a 112-iteration scan
at bench batch to decide which to use.

Usage: timeout 3000 python scripts/probe_sort_vs_matrix.py [n_envs]
"""
import os
import signal
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32


def bounded(label, seconds, fn):
    def _bail(s, f):
        raise TimeoutError(label)
    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(seconds)
    try:
        return fn()
    finally:
        signal.alarm(0)


def s_matrix(rank, q, crossing):
    better = crossing[:, None] & (rank[:, None] < rank[None, :])
    return jnp.sum(jnp.where(better, q[:, None], 0), axis=0).astype(I32)


def s_sort(rank, q, crossing):
    n = rank.shape[0]
    c = jnp.where(crossing, q, 0).astype(I32)
    iota = jax.lax.broadcasted_iota(I32, (n,), 0)
    # sort by rank (a permutation incl. the invalid tail at rank n... ranks
    # are unique for valid slots; invalid all have rank n — stable sort keeps
    # slot order, harmless since their c is 0)
    rank_s, c_s, iota_s = jax.lax.sort((rank, c, iota), num_keys=1)
    prefix = (jnp.cumsum(c_s) - c_s).astype(I32)
    # sort back by original slot index
    _, S = jax.lax.sort((iota_s, prefix), num_keys=1)
    return S


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n, n_msgs, N_ITERS = 100, 112, 16
    rng = np.random.default_rng(0)

    perm = np.stack([rng.permutation(n) for _ in range(n_envs)]).astype(np.int32)
    q0 = rng.integers(1, 500, (n_envs, n)).astype(np.int32)
    cr0 = (rng.random((n_envs, n)) < 0.3)

    rank = jnp.asarray(perm)
    q = jnp.asarray(q0)
    crossing = jnp.asarray(cr0)

    # correctness
    a = jax.jit(jax.vmap(s_matrix))(rank, q, crossing)
    b = jax.jit(jax.vmap(s_sort))(rank, q, crossing)
    assert np.array_equal(np.asarray(a), np.asarray(b)), "mismatch"
    print("S identical across impls", flush=True)

    for name, fn in (("matrix", s_matrix), ("sort", s_sort)):
        vfn = jax.vmap(fn)

        @jax.jit
        def run(rank, q, crossing):
            def body(acc, i):
                S = vfn(rank, (q + i) % 500 + 1, crossing)
                return acc + jnp.sum(S.astype(jnp.int64)), None
            def msgs(acc, j):
                acc2, _ = jax.lax.scan(body, acc,
                                       jnp.arange(n_msgs, dtype=I32))
                return acc2, None
            acc, _ = jax.lax.scan(msgs, jnp.int64(0),
                                  jnp.arange(N_ITERS, dtype=I32))
            return acc

        bounded(f"{name} compile", 600,
                lambda: np.asarray(run(rank, q, crossing)))
        dts = []
        for _ in range(3):
            t0 = time.time()
            bounded(f"{name} run", 300,
                    lambda: np.asarray(run(rank, q, crossing)))
            dts.append(time.time() - t0)
        per_scan = min(dts) / N_ITERS
        print(f"{name:7s} {per_scan*1e3:8.2f} ms per {n_msgs}-msg scan "
              f"({per_scan/n_msgs*1e6:7.1f} us/msg)", flush=True)


if __name__ == "__main__":
    main()
