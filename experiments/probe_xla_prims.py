"""Measure the XLA primitives the incoherent redesign would ride on:
argsort, row gathers, cumsum — 1M-4M scale, v5e."""
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def bench(f, *args, iters=10):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


rng = np.random.RandomState(0)
for n in (1 << 20, 2 << 20, 4 << 20):
    keys = jnp.asarray(rng.randint(0, 1 << 30, n), jnp.int32)
    f = jax.jit(lambda k: jnp.argsort(k))
    dt = bench(f, keys)
    print(f"argsort {n>>20}M i32: {dt*1e3:.2f} ms")
    f2 = jax.jit(lambda k: jnp.sort(k))
    dt = bench(f2, keys)
    print(f"sort    {n>>20}M i32: {dt*1e3:.2f} ms")

# gather B rows from (N, C) tables
for (N, C) in ((7000, 56), (43000, 112), (43000, 56)):
    tbl = jnp.asarray(rng.rand(N, C), jnp.float32)
    for B in (1 << 20,):
        idx = jnp.asarray(rng.randint(0, N, B), jnp.int32)
        f = jax.jit(lambda t, i: jnp.sum(t[i], axis=1))
        dt = bench(f, tbl, idx)
        gb = B * C * 4 / 1e9
        print(f"gather {B>>20}M rows of ({N},{C}): {dt*1e3:.2f} ms "
              f"({gb/dt:.0f} GB/s)")
        # sorted indices
        idxs = jnp.sort(idx)
        dt = bench(f, tbl, idxs)
        print(f"  sorted idx: {dt*1e3:.2f} ms ({gb/dt:.0f} GB/s)")

B = 8 << 20
x = jnp.asarray(rng.randint(0, 2, B), jnp.int32)
f = jax.jit(lambda v: jnp.cumsum(v))
print(f"cumsum 8M i32: {bench(f, x)*1e3:.2f} ms")

# compaction: keys 0/1 flag argsort + take (stable partition)
B = 2 << 20
flags = jnp.asarray(rng.randint(0, 2, B), jnp.int32)
vals = jnp.asarray(rng.randint(0, 1 << 30, B), jnp.int32)
f = jax.jit(lambda fl, v: v[jnp.argsort(1 - fl, stable=True)])
print(f"partition 2M by flag: {bench(f, flags, vals)*1e3:.2f} ms")
