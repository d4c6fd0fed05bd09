#!/usr/bin/env python
"""VPU op-rate microbench: f32 vs bf16 elementwise chains in Pallas.

Decides whether bf16 node-bound math can halve the packet kernel's
per-pop vector cost (2x packed bf16 VPU rate?) or only its VMEM
footprint."""
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

ITERS = 2000


def make(dtype, rows):
    def kernel(x_ref, o_ref):
        def body(i, x):
            # mul + sub + max + min: the slab-test op mix
            a = x * jnp.asarray(1.000001, dtype)
            b = a - jnp.asarray(0.5, dtype)
            c = jnp.maximum(b, x)
            return jnp.minimum(c, jnp.asarray(100.0, dtype))
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), dtype),
        )(x)
    return run


def main():
    for dtype, rows in ((jnp.float32, 64), (jnp.bfloat16, 64),
                        (jnp.float32, 256), (jnp.bfloat16, 256),
                        (jnp.int32, 256), (jnp.int16, 256)):
        x = jnp.ones((rows, 128), dtype)
        fn = make(dtype, rows)
        r = fn(x)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(20):
            r = fn(x)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 20
        ops = 4 * ITERS * rows * 128
        print(f"{jnp.dtype(dtype).name:>9} rows={rows:>4}: {dt*1e6:8.1f} us "
              f"-> {ops/dt/1e12:6.2f} Top/s")


if __name__ == "__main__":
    main()
