#!/usr/bin/env python
"""Cost of dynamic-index VMEM accesses inside kernel loops, and whether
explicit async copies can overlap them across independent streams."""
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

N_IT = 2000
TAB = 4096


def timeit(name, fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(20):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 20
    print(f"{name:>24}: {dt/N_IT*1e9:8.1f} ns/iter")


def make(body_fn, scratch=()):
    def kernel(tab_ref, o_ref, *scr):
        def body(i, acc):
            return body_fn(tab_ref, i, acc, scr)
        o_ref[:] = jax.lax.fori_loop(0, N_IT, body,
                                     jnp.zeros((8, 128), jnp.float32))

    @jax.jit
    def run(tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=list(scratch),
        )(tab)
    return run


def b_static(tab_ref, i, acc, scr):
    return acc + tab_ref[0:8, :]


def b_dyn1(tab_ref, i, acc, scr):
    idx = acc[0, 0].astype(jnp.int32) % 64 + i % 64
    return acc + tab_ref[pl.ds(idx * 8, 8), :]


def b_dyn4(tab_ref, i, acc, scr):
    idx = acc[0, 0].astype(jnp.int32) % 64 + i % 64
    a = tab_ref[pl.ds(idx * 8, 8), :]
    b = tab_ref[pl.ds(idx * 8 + 64, 8), :]
    c = tab_ref[pl.ds(idx * 8 + 128, 8), :]
    d = tab_ref[pl.ds(idx * 8 + 192, 8), :]
    return acc + a + b + c + d


def b_dynrow1(tab_ref, i, acc, scr):
    idx = acc[0, 0].astype(jnp.int32) % 512 + i % 64
    return acc + jnp.broadcast_to(tab_ref[pl.ds(idx, 1), :], (8, 128))


def b_async4(tab_ref, i, acc, scr):
    buf, sems = scr
    idx = acc[0, 0].astype(jnp.int32) % 64 + i % 64
    dmas = []
    for s in range(4):
        dma = pltpu.make_async_copy(
            tab_ref.at[pl.ds(idx * 8 + s * 64, 8), :],
            buf.at[pl.ds(s * 8, 8), :],
            sems.at[s])
        dma.start()
        dmas.append(dma)
    out = acc
    for s in range(4):
        dmas[s].wait()
        out = out + buf[pl.ds(s * 8, 8), :]
    return out


def main():
    tab = jnp.arange(TAB * 128, dtype=jnp.float32).reshape(TAB, 128) * 1e-9
    timeit("static (8,128) load", make(b_static), tab)
    timeit("dyn (8,128) load x1", make(b_dyn1), tab)
    timeit("dyn (8,128) load x4", make(b_dyn4), tab)
    timeit("dyn (1,128) load x1", make(b_dynrow1), tab)
    timeit("async copy x4 overlap", make(
        b_async4, [pltpu.VMEM((32, 128), jnp.float32),
                   pltpu.SemaphoreType.DMA((4,))]), tab)


if __name__ == "__main__":
    main()
