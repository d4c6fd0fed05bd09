"""Round-3 follow-up probes: the row-gather table-size cliff, row
scatters, and a minimal fused any-hit lockstep iteration.

Findings feed the incoherent-traversal redesign (VERDICT item 1):
probe_xla_prims measured 2.6 ns/row gathers from a 1.5 MB table vs
11.1 ns/row from 9.6/19 MB tables (width-independent) — this sweeps the
cliff and tests bf16 compression, then prices the candidate loop bodies.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

K = 24


def bench_rep(make_f, *args, iters=5):
    f1, fk = make_f(1), make_f(K)

    def run(f):
        out = f(*args)
        first = out[0] if isinstance(out, tuple) else out
        _ = np.asarray(jax.device_get(first.ravel()[:8]))

    run(f1); run(fk)
    ts = {1: [], K: []}
    for _ in range(iters):
        for k, f in ((1, f1), (K, fk)):
            t0 = time.perf_counter()
            run(f)
            ts[k].append(time.perf_counter() - t0)
    return (np.median(ts[K]) - np.median(ts[1])) / (K - 1)


rng = np.random.RandomState(0)
B = 1 << 20

print("== row-gather table-size sweep (1M rows gathered, C=56)")
for N, dt_ in ((7000, jnp.float32), (14000, jnp.float32),
               (28000, jnp.float32), (43000, jnp.float32),
               (86000, jnp.float32), (43000, jnp.bfloat16),
               (86000, jnp.bfloat16), (172000, jnp.bfloat16)):
    C = 56
    mb = N * C * (2 if dt_ == jnp.bfloat16 else 4) / 1e6
    tbl = jnp.asarray(rng.rand(N, C), dt_)
    idx0 = jnp.asarray(rng.randint(0, N, B), jnp.int32)

    def mk(k, tbl=tbl, N=N):
        def body(_, idx):
            v = tbl[idx].astype(jnp.float32)
            s = jnp.sum(v, axis=1)
            return (idx + s.astype(jnp.int32)) % N
        return jax.jit(lambda i: jax.lax.fori_loop(0, k, body, i))
    dtm = bench_rep(mk, idx0)
    print(f"  ({N:6d},56) {str(np.dtype(dt_ if dt_ != jnp.bfloat16 else np.float16)):8s}"
          f" {mb:6.1f} MB: {dtm*1e3:7.3f} ms ({dtm/B*1e9:5.2f} ns/row)",
          flush=True)

print("== row scatter (append): 512K 14-col rows into (4M,14)")
P = 1 << 19
Cq = 1 << 22
rows0 = jnp.asarray(rng.rand(P, 14), jnp.float32)
slot0 = jnp.asarray(rng.randint(0, Cq, P), jnp.int32)


def mk(k):
    def body(_, c):
        rows, slot = c
        out = jnp.zeros((Cq, 14), jnp.float32).at[slot].set(rows)
        return (rows + out[:P], (slot + 1) % Cq)
    return jax.jit(lambda r, s: jax.lax.fori_loop(0, k, body, (r, s)))


dtm = bench_rep(mk, rows0, slot0)
print(f"  {dtm*1e3:.3f} ms ({dtm/P*1e9:.2f} ns/row)", flush=True)

print("== minimal any-hit lockstep iteration, B=1M, single stack")
# one pop: single-stack one-hot pop over S slots + node-row gather +
# 8-child slab test + push via one-hot writes. No leaf unit (measures
# the node-side skeleton alone).
N = 7000
S = 16
nodes = jnp.asarray(rng.rand(N, 56), jnp.float32)
R = B // 128
org = tuple(jnp.asarray(rng.rand(R, 128), jnp.float32) for _ in range(3))
ivd = tuple(jnp.asarray(rng.rand(R, 128) + 0.5, jnp.float32)
            for _ in range(3))


def mk_lockstep(k):
    def body(_, carry):
        stack, ptr = carry
        top = ptr - 1
        code = jnp.zeros((R, 128), jnp.int32)
        for i in range(S):
            code = jnp.where(top == i, stack[i], code)
        nidx = jnp.clip(code, 0, N - 1)
        rows = nodes[nidx.reshape(-1)]
        nc = rows.T.reshape(56, R, 128)
        pushes = []
        for c in range(8):
            tx0 = (nc[c] - org[0]) * ivd[0]
            tx1 = (nc[8 + c] - org[0]) * ivd[0]
            ty0 = (nc[16 + c] - org[1]) * ivd[1]
            ty1 = (nc[24 + c] - org[1]) * ivd[1]
            tz0 = (nc[32 + c] - org[2]) * ivd[2]
            tz1 = (nc[40 + c] - org[2]) * ivd[2]
            ent = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                          jnp.minimum(ty0, ty1)),
                              jnp.minimum(tz0, tz1))
            ext = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                          jnp.maximum(ty0, ty1)),
                              jnp.maximum(tz0, tz1))
            ch = jax.lax.bitcast_convert_type(nc[48 + c], jnp.int32)
            pushes.append((ent <= ext, ch & 0x3FFF))
        nstack = list(stack)
        rank = jnp.zeros((R, 128), jnp.int32)
        pos = []
        for c in range(8):
            pos.append(jnp.where(pushes[c][0], top + rank, -1))
            rank = rank + pushes[c][0].astype(jnp.int32)
        for si in range(S):
            v = nstack[si]
            for c in range(8):
                v = jnp.where(pos[c] == si, pushes[c][1], v)
            nstack[si] = v
        ptr = jnp.clip(top + rank, 0, S - 1)
        return (tuple(nstack), ptr)

    def f(stack0, ptr0):
        return jax.lax.fori_loop(0, k, body, (stack0, ptr0))[1]
    return jax.jit(f)


stack0 = tuple(jnp.asarray(rng.randint(0, N, (R, 128)), jnp.int32)
               for _ in range(S))
ptr0 = jnp.asarray(rng.randint(1, 4, (R, 128)), jnp.int32)
dtm = bench_rep(mk_lockstep, stack0, ptr0)
print(f"  node-only pop+test+push: {dtm*1e3:.3f} ms/iter "
      f"({dtm/B*1e9:5.2f} ns/ray/iter)", flush=True)
