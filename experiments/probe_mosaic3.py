#!/usr/bin/env python
"""Probe: cost of getting one lane of a loaded VMEM row out to a
(R, 128) operand inside a dependent while_loop.

  extract : s = row[0, j]  (vector->scalar) then scalar-vector op
  slice   : jnp.broadcast_to(row[:, j:j+1], (R, 128))  (stays vector)
  rollred : broadcast via roll + sublane trick

If `slice` is much cheaper than `extract`, the packet kernel's 48-112
per-pop extracts can become vector lane-splats.
"""
import functools
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 64          # rows of the consuming operand
K = 24          # lane-values consumed per iteration (leaf-ish)
N = 4096        # loop iterations


def _kernel(tab_ref, out_ref, mode):
    def body(c):
        i, acc = c
        idx = jax.lax.rem(i * 7 + 3, jnp.int32(1024))
        row = tab_ref[pl.ds(idx, 1), :]
        if mode == "extract":
            for j in range(K):
                acc = acc + row[0, j * 5 % 128]
        elif mode == "slice":
            for j in range(K):
                lane = row[:, (j * 5 % 128):(j * 5 % 128) + 1]
                l128 = jnp.broadcast_to(lane, (1, 128))
                acc = acc + l128   # (1,128)+(R,128): sublane broadcast
        elif mode == "none":
            acc = acc + 1.0
        return (i + 1, acc)

    def cond(c):
        return c[0] < N

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0),
                                             jnp.zeros((R, 128),
                                                       jnp.float32)))
    out_ref[:] = acc


def run(mode):
    tab = jnp.arange(1024 * 128, dtype=jnp.float32).reshape(1024, 128)
    fn = pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    fj = jax.jit(fn)
    o = fj(tab)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(10):
        o = fj(tab)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / 10
    print(f"{mode:>8}: {dt / N * 1e9:7.1f} ns/iter "
          f"({K} lane reads)", flush=True)


for m in ("none", "extract", "slice"):
    run(m)


def _kernel2(tab_ref, out_ref, mode):
    def body(c):
        i, idx, acc = c
        row = tab_ref[pl.ds(idx, 1), :]
        if mode == "dep-extract":
            for j in range(K):
                acc = acc + row[0, j * 5 % 128]
        else:
            for j in range(K):
                lane = row[:, (j * 5 % 128):(j * 5 % 128) + 1]
                acc = acc + jnp.broadcast_to(lane, (1, 128))
        nxt = jax.lax.bitcast_convert_type(row, jnp.int32)[0, 0]
        return (i + 1, nxt, acc)

    def cond(c):
        return c[0] < N

    _, _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0),
                     jnp.zeros((R, 128), jnp.float32)))
    out_ref[:] = acc


def run2(mode):
    import numpy as np
    rng = np.random.default_rng(0)
    perm = rng.permutation(1024).astype(np.int32)
    tab = np.zeros((1024, 128), np.float32)
    tab[:, 0] = perm.view(np.float32)
    tab = jnp.asarray(tab)
    fn = pl.pallas_call(
        functools.partial(_kernel2, mode=mode),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    fj = jax.jit(fn)
    o = fj(tab)
    jax.block_until_ready(o)
    import time as _t
    t0 = _t.perf_counter()
    for _ in range(10):
        o = fj(tab)
    jax.block_until_ready(o)
    dt = (_t.perf_counter() - t0) / 10
    print(f"{mode:>12}: {dt / N * 1e9:7.1f} ns/iter ({K} lane reads, "
          f"dependent chase)", flush=True)


for m in ("dep-extract", "dep-slice"):
    run2(m)
