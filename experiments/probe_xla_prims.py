"""Measure the XLA primitives the incoherent redesign would ride on:
argsort, row gathers, cumsum, scatter — 1M scale, v5e.

Remote-backend gotcha (ROADMAP): block_until_ready returns early on some
XLA programs through the axon tunnel, and a host fetch has a ~30 ms
round-trip latency floor that buries any single op. So every benchmark
repeats the op K times INSIDE one jit via a data-dependent fori_loop
(output feeds the next input so XLA cannot hoist it), then does one
fetch; cost = (T(K) - T(1)) / (K - 1).
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

K = 32


def bench_rep(make_f, *args, iters=5):
    """make_f(k) -> jitted fn running the op k times chained."""
    f1, fk = make_f(1), make_f(K)

    def run(f):
        out = f(*args)
        first = out[0] if isinstance(out, tuple) else out
        _ = np.asarray(jax.device_get(first.ravel()[:8]))

    run(f1); run(fk)  # compile + warm
    ts = {1: [], K: []}
    for _ in range(iters):
        for k, f in ((1, f1), (K, fk)):
            t0 = time.perf_counter()
            run(f)
            ts[k].append(time.perf_counter() - t0)
    t1, tk = np.median(ts[1]), np.median(ts[K])
    return (tk - t1) / (K - 1)


rng = np.random.RandomState(0)

# argsort 1M i32 (the compaction/sort primitive)
for n in (1 << 20,):
    keys = jnp.asarray(rng.randint(0, 1 << 30, n), jnp.int32)

    def mk(k):
        def body(_, c):
            p = jnp.argsort(c)
            return c[p] ^ p  # depend on result
        return jax.jit(lambda x: jax.lax.fori_loop(0, k, body, x))
    dt = bench_rep(mk, keys)
    print(f"argsort+apply {n>>20}M i32: {dt*1e3:.3f} ms", flush=True)

# gather B rows from (N, C) node tables
for (N, C, B) in ((7000, 56, 1 << 20), (43000, 56, 1 << 20),
                  (43000, 104, 1 << 20), (7000, 56, 1 << 17)):
    tbl = jnp.asarray(rng.rand(N, C), jnp.float32)
    idx0 = jnp.asarray(rng.randint(0, N, B), jnp.int32)

    def mk(k, tbl=tbl, N=N):
        def body(_, idx):
            v = tbl[idx]                      # (B, C) gather
            s = jnp.sum(v, axis=1)
            return (idx + s.astype(jnp.int32)) % N
        return jax.jit(lambda i: jax.lax.fori_loop(0, k, body, i))
    dt = bench_rep(mk, idx0)
    gb = B * C * 4 / 1e9
    print(f"gather {B>>10}K rows of ({N},{C}): {dt*1e3:.3f} ms "
          f"({gb/dt:.0f} GB/s)", flush=True)

# 1D scalar gather: B values from (M,) f32
B = 1 << 20
vals = jnp.asarray(rng.rand(B), jnp.float32)
idx0 = jnp.asarray(rng.randint(0, B, B), jnp.int32)


def mk(k):
    def body(_, idx):
        v = vals[idx]
        return (idx + v.astype(jnp.int32) + 1) % B
    return jax.jit(lambda i: jax.lax.fori_loop(0, k, body, i))


print(f"gather 1M scalars from 1M: {bench_rep(mk, idx0)*1e3:.3f} ms",
      flush=True)

# cumsum 1M/4M i32 (queue compaction offsets)
for n in (1 << 20, 4 << 20):
    x0 = jnp.asarray(rng.randint(0, 2, n), jnp.int32)

    def mk(k, n=n):
        def body(_, x):
            c = jnp.cumsum(x)
            return (x + c) & 1
        return jax.jit(lambda v: jax.lax.fori_loop(0, k, body, v))
    print(f"cumsum {n>>20}M i32: {bench_rep(mk, x0)*1e3:.3f} ms",
          flush=True)

# scatter by computed slot: out[slot[i]] = val[i] (queue append)
B = 1 << 20
slot0 = jnp.asarray(rng.permutation(B), jnp.int32)


def mk(k):
    def body(_, s):
        out = jnp.zeros(B, jnp.int32).at[s].set(s)
        return out
    return jax.jit(lambda s: jax.lax.fori_loop(0, k, body, s))


print(f"scatter 1M i32 by perm: {bench_rep(mk, slot0)*1e3:.3f} ms",
      flush=True)

# scatter-min 1M into 256K (t_best updates)
Bp, Br = 1 << 20, 1 << 18
sidx = jnp.asarray(rng.randint(0, Br, Bp), jnp.int32)


def mk(k):
    def body(_, c):
        t, i = c
        sval = t[i % Bp // (Bp // Br)] + 1.0  # derived vals, keep dep
        t2 = jnp.full(Br, 1e30, jnp.float32).at[i].min(
            jnp.broadcast_to(sval[:1], (Bp,)))
        return (t2, (i + 1) % Br)
    return jax.jit(lambda t, i: jax.lax.fori_loop(
        0, k, body, (t, i))[0])


t0v = jnp.full(Br, 1e30, jnp.float32)
print(f"scatter-min 1M into 256K: "
      f"{bench_rep(mk, t0v, sidx)*1e3:.3f} ms", flush=True)

# a realistic BFS expansion round, fused: gather node rows for P pairs,
# slab-test 8 children, emit compacted child pairs (cumsum+scatter)
for P in (1 << 18, 1 << 20):
    N = 7000
    nodes = jnp.asarray(rng.rand(N, 56), jnp.float32)
    pr0 = jnp.asarray(rng.randint(0, N, P), jnp.int32)
    rid0 = jnp.asarray(rng.randint(0, 1 << 20, P), jnp.int32)
    org = jnp.asarray(rng.rand(1 << 20, 3), jnp.float32)
    invd = jnp.asarray(rng.rand(1 << 20, 3), jnp.float32) + 0.5

    def mk(k, nodes=nodes, org=org, invd=invd, N=N, P=P):
        def body(_, c):
            pr, rid = c
            row = nodes[pr]                       # (P,56)
            b = row[:, :48].reshape(P, 6, 8)
            o = org[rid][:, :, None]
            iv = invd[rid][:, :, None]
            tn = (b[:, 0::2] - o) * iv            # (P,3,8)
            tf = (b[:, 1::2] - o) * iv
            ent = jnp.maximum(jnp.minimum(tn, tf).max(1), 0.0)
            ext = jnp.minimum(jnp.maximum(tn, tf).min(1), 1e30)
            ch = row[:, 48:].astype(jnp.int32) % N
            hit = (ent <= ext)
            flat_ch = ch.reshape(-1)
            flat_rid = jnp.repeat(rid, 8)
            flat_hit = hit.reshape(-1)
            pos = jnp.cumsum(flat_hit.astype(jnp.int32)) - 1
            slot = jnp.where(flat_hit, pos, 2 * P * 8 - 1)
            npr = jnp.zeros(P, jnp.int32).at[slot.clip(0, P - 1)].set(
                flat_ch, mode="drop")
            nrid = jnp.zeros(P, jnp.int32).at[slot.clip(0, P - 1)].set(
                flat_rid, mode="drop")
            return (jnp.where(npr == 0, pr, npr) % N, nrid % (1 << 20))
        return jax.jit(lambda p, r: jax.lax.fori_loop(0, k, body,
                                                      (p, r)))
    dt = bench_rep(mk, pr0, rid0)
    print(f"BFS round, {P>>10}K pairs (gather+test+compact): "
          f"{dt*1e3:.3f} ms ({P/dt/1e6:.0f} Mpairs/s)", flush=True)
