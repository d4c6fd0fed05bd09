"""Pin down the row-gather cliff (row count? exactly 32768?) and the
wide-row bandwidth for m=16 tri packet tables (224 cols)."""
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

for N, C in ((32768, 56), (32769, 56), (36000, 56), (40000, 56),
             (24000, 224), (24000, 112), (32768, 112), (65536, 56),
             (131072, 56), (1 << 20, 16)):
    tbl = jnp.asarray(rng.rand(N, C), jnp.float32)
    idx0 = jnp.asarray(rng.randint(0, N, B), jnp.int32)

    def mk(k, tbl=tbl, N=N):
        def body(_, idx):
            v = tbl[idx]
            s = jnp.sum(v, axis=1)
            return (idx + s.astype(jnp.int32)) % N
        return jax.jit(lambda i: jax.lax.fori_loop(0, k, body, i))
    dtm = bench_rep(mk, idx0)
    gbs = B * C * 4 / dtm / 1e9
    print(f"  ({N:7d},{C:3d}) {N*C*4/1e6:7.1f} MB: {dtm*1e3:7.3f} ms "
          f"({dtm/B*1e9:6.2f} ns/row, {gbs:4.0f} GB/s)", flush=True)
