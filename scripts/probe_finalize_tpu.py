"""On-chip microbenchmark of trade-buffer assembly variants (round-2,
VERDICT item 2 follow-up): isolates why postscan mode lost 16x in the full
bench while the op-count model predicted ~parity.

Times, at bench shapes (4096 envs x M=112 x n=100, REPS amortised in-jit):
  scanonly   - postscan message scan WITHOUT finalize (planes produced,
               trades left untouched) vs compressed cap16 scan: isolates
               the in-scan cost of emitting (M, n) planes.
  fin_mxu    - _finalize_trades_postscan as shipped (one wide bf16 chunk
               matmul).
  fin_take   - same mapping via jnp.take row-gather (no matmul).
  fin_einsum - int32 one-hot einsum on the VPU.
  fin_comp   - compressed-mode _finalize_trades at cap in {16, 100}.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jaxmarl_hft_tpu.config.structs import LobConfig
from jaxmarl_hft_tpu.lob import engine

E, M, n, nT, REPS = 4096, 112, 100, 100, 20
I32 = jnp.int32
key = jax.random.PRNGKey(0)

def timed(f, *args, tag=""):
    t0 = time.time(); np.asarray(f(*args)); t1 = time.time()
    t0 = time.time(); s = np.asarray(f(*args)); t2 = time.time()
    print(f"{tag}: {1000*(t2-t0)/REPS:.2f} ms/iter (compile {t1-t0:.0f}s, out {s:.3g})", flush=True)

# ---- synthetic postscan recs ------------------------------------------------
ks = jax.random.split(key, 10)
K = jax.random.randint(ks[0], (E, M), 0, 3)
RK = jnp.where(jax.random.uniform(ks[1], (E, M, n)) < 0.02,
               jax.random.randint(ks[2], (E, M, n), 0, 4), n).astype(I32)
FQ = jax.random.randint(ks[3], (E, M, n), -50, 50).astype(I32)
PP = jax.random.randint(ks[4], (E, M, n), 90_000, 110_000).astype(I32)
POID = jax.random.randint(ks[5], (E, M, n), -2**28, 2**28).astype(I32)
PTID = POID
Lx = jax.random.randint(ks[6], (E, M), 0, 100).astype(I32)
Sx = jax.random.randint(ks[7], (E, M), 0, 2**20).astype(I32)
recs = (FQ, RK, PP, POID, PTID, Lx, Lx, Lx, Lx, K, Sx, Sx, Sx, Sx)
init_trades = tuple(jnp.full((E, nT), -1, I32) for _ in range(8))
cfg = LobConfig(trade_capture_mode="postscan")

def fin_mxu(recs, tr):
    out = jax.vmap(lambda r, t: engine._finalize_trades_postscan(cfg, t, r))(recs, tr)
    return out[0].sum()

def _fin_generic(gather, r, t):
    (FQ, RK, PP, POID, PTID, LP, LQ, LOID, LTID, K, AOID, TS, TN, ATID) = r
    first_empty = engine._first_true(t[4] == -1)
    base0 = jnp.where(first_empty >= 0, first_empty, nT - 1)
    cum = base0 + jnp.cumsum(K) - K
    ti = jax.lax.broadcasted_iota(I32, (nT,), 0)
    W = (cum[None, :] <= ti[:, None]) & (ti[:, None] < (cum + K)[None, :])
    valid_t = jnp.any(W, axis=1)
    cum_at = jnp.sum(jnp.where(W, cum[None, :], 0), axis=1)
    rr = ti - cum_at
    G_rk, G_fq, G_pp, G_poid, G_ptid = gather(W, (RK, FQ, PP, POID, PTID))
    sel = G_rk == rr[:, None]
    pick = lambda G: jnp.sum(jnp.where(sel, G, 0), axis=1).astype(I32)
    per_msg = lambda S: jnp.sum(jnp.where(W, S[None, :], 0), axis=1).astype(I32)
    hit = valid_t & (ti < nT - 1)
    vals = (pick(G_pp), pick(G_fq), pick(G_poid), per_msg(AOID),
            per_msg(TS), per_msg(TN), pick(G_ptid), per_msg(ATID))
    out = tuple(jnp.where(hit, v, cur) for v, cur in zip(vals, t))
    return out

def g_take(W, planes):
    m_of_t = jnp.argmax(W, axis=1)          # (nT,), 0 when no match (guarded)
    return [jnp.take(X, m_of_t, axis=0) for X in planes]

def g_einsum(W, planes):
    Wi = W.astype(I32)
    return [jnp.einsum('tm,mn->tn', Wi, X) for X in planes]

def fin_take(recs, tr):
    out = jax.vmap(lambda r, t: _fin_generic(g_take, r, t))(recs, tr)
    return out[0].sum()

def fin_einsum(recs, tr):
    out = jax.vmap(lambda r, t: _fin_generic(g_einsum, r, t))(recs, tr)
    return out[0].sum()

def rep(f):
    @jax.jit
    def run(recs, tr):
        def one(c, _):
            return c, f(recs, tr)
        _, s = jax.lax.scan(one, 0, None, length=REPS)
        return s.sum()
    return run

# ---- compressed finalize reference ------------------------------------------
def mk_comp(cap):
    cfgc = LobConfig(trade_capture_mode="compressed", trade_capture_cap=cap)
    Pc = jax.random.randint(ks[8], (E, M, cap), 0, 100).astype(I32)
    rc = (Pc, Pc, Pc, Pc, Lx, Lx, Lx, Lx, K, Sx, Sx, Sx, Sx)
    def f(recs_unused, tr):
        out = jax.vmap(lambda r, t: engine._finalize_trades(cfgc, t, r))(rc, tr)
        return out[0].sum()
    return f

# ---- scan-only comparison ---------------------------------------------------
def mkmsgs(k):
    kk = jax.random.split(k, 8)
    types = jax.random.choice(kk[0], jnp.array([1,1,1,2,4]), (M,))
    sides = jax.random.choice(kk[1], jnp.array([-1,1]), (M,))
    quants = jax.random.randint(kk[2], (M,), 1, 50)
    prices = 100_000 + 100*jax.random.randint(kk[3], (M,), -10, 11)
    oids = jax.random.randint(kk[4], (M,), 1, 4000)
    ts = jnp.full((M,), 34200, jnp.int32)
    tn = jax.random.randint(kk[6], (M,), 0, 1000)
    return jnp.stack([types, sides, quants, prices, oids, oids, ts, tn], 1).astype(I32)

msgs = jax.vmap(mkmsgs)(jax.random.split(key, E))
book = (engine.init_orderside(n), engine.init_orderside(n), engine.init_trades(nT))
books = jax.tree.map(lambda x: jnp.broadcast_to(x, (E,)+x.shape), book)
keys2 = jax.random.split(key, E)

def mk_scan(mode, cap, skip_finalize):
    cfgx = LobConfig(trade_capture_mode=mode, trade_capture_cap=cap)
    def scan_one(k, m, b):
        kk = jax.random.split(k, m.shape[0])
        soa = engine._scan_init(cfgx, b)
        def step(state, xs):
            return engine._apply_message_soa(cfgx, state, xs[0], xs[1])
        final, recs = jax.lax.scan(step, soa, (kk, m))
        if skip_finalize:
            return final[0][0].sum() + jax.tree.reduce(
                lambda a, b: a + b, jax.tree.map(lambda x: x.sum(), recs), 0)
        tr = engine._scan_trades(cfgx, final, b[2], recs)
        return final[0][0].sum() + tr[0].sum()
    @jax.jit
    def run():
        def one(c, _):
            return c, jax.vmap(scan_one)(keys2, msgs, books).sum()
        _, s = jax.lax.scan(one, 0, None, length=5)
        return s.sum()
    return run

if __name__ == "__main__":
    import sys
    which = sys.argv[1:] or ["fin", "scan"]
    if "fin" in which:
        timed(rep(fin_mxu), recs, init_trades, tag="fin_mxu   ")
        timed(rep(fin_take), recs, init_trades, tag="fin_take  ")
        timed(rep(fin_einsum), recs, init_trades, tag="fin_einsum")
        timed(rep(mk_comp(16)), recs, init_trades, tag="fin_comp16")
        timed(rep(mk_comp(100)), recs, init_trades, tag="fin_comp100")
    if "scan" in which:
        for tag, mode, cap, skip in (
                ("scan comp16  +fin", "compressed", 16, False),
                ("scan postscan -fin", "postscan", 0, True),
                ("scan postscan +fin", "postscan", 0, False),
                ("scan inscan       ", "inscan", 0, False)):
            f = mk_scan(mode, cap, skip)
            t0=time.time(); np.asarray(f()); t1=time.time()
            t0=time.time(); s=np.asarray(f()); t2=time.time()
            print(f"{tag}: {1000*(t2-t0)/5:.1f} ms/scan (compile {t1-t0:.0f}s)", flush=True)
