"""Probe: row-sharded gather for >28K-row tables.

Split (43000,112) into 2 shards of ≤22K rows (each rides the measured
fast gather path at 2.5 ns/row), gather both, combine. Tests select-chain
vs zero-row-sum combining, plus a 4-shard 90K-row case.
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

for (N, C) in ((43000, 112), (90000, 56)):
    S = -(-N // ((N + 22527) // 22528))  # even-ish shard rows <= 22528
    nsh = -(-N // S)
    tbl = jnp.asarray(rng.rand(N, C), jnp.float32)
    pad = jnp.zeros((nsh * S - N, C), jnp.float32)
    tblp = jnp.concatenate([tbl, pad]).reshape(nsh, S, C)
    idx0 = jnp.asarray(rng.randint(0, N, B), jnp.int32)

    def mk_sel(k, tblp=tblp, S=S, nsh=nsh, N=N):
        def body(_, idx):
            out = None
            for s in range(nsh):
                loc = jnp.clip(idx - s * S, 0, S - 1)
                g = tblp[s][loc]
                out = g if out is None else jnp.where(
                    (idx >= s * S)[:, None], g, out)
            t = jnp.sum(out, axis=1)
            return (idx + t.astype(jnp.int32)) % N
        return jax.jit(lambda i: jax.lax.fori_loop(0, k, body, i))

    dtm = bench_rep(mk_sel, idx0)
    print(f"  ({N},{C}) {nsh}-shard select: {dtm*1e3:7.3f} ms "
          f"({dtm/B*1e9:5.2f} ns/row)", flush=True)

    # zero-row sum variant
    tblz = jnp.concatenate(
        [tblp, jnp.zeros((nsh, 1, C), jnp.float32)], axis=1)

    def mk_sum(k, tblz=tblz, S=S, nsh=nsh, N=N):
        def body(_, idx):
            out = 0.0
            for s in range(nsh):
                loc = idx - s * S
                loc = jnp.where((loc >= 0) & (loc < S), loc, S)
                out = out + tblz[s][loc]
            t = jnp.sum(out, axis=1)
            return (idx + t.astype(jnp.int32)) % N
        return jax.jit(lambda i: jax.lax.fori_loop(0, k, body, i))

    dtm = bench_rep(mk_sum, idx0)
    print(f"  ({N},{C}) {nsh}-shard zerosum: {dtm*1e3:7.3f} ms "
          f"({dtm/B*1e9:5.2f} ns/row)", flush=True)

# reference: unsharded
tbl = jnp.asarray(rng.rand(43000, 112), jnp.float32)
idx0 = jnp.asarray(rng.randint(0, 43000, B), jnp.int32)


def mk(k):
    def body(_, idx):
        t = jnp.sum(tbl[idx], axis=1)
        return (idx + t.astype(jnp.int32)) % 43000
    return jax.jit(lambda i: jax.lax.fori_loop(0, k, body, i))


dtm = bench_rep(mk, idx0)
print(f"  (43000,112) plain: {dtm*1e3:7.3f} ms ({dtm/B*1e9:5.2f} ns/row)",
      flush=True)
