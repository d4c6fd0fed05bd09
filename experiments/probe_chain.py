#!/usr/bin/env python
"""Probe: latency of a DEPENDENT pointer-chase through VMEM inside a
Pallas while_loop, and whether S independent chases interleaved in one
loop overlap (latency hiding) or serialize.

Chain step: idx -> row = tab[idx] -> extract lane 0 -> next idx.
That is the minimal analog of the packet kernel's pop->load->test->push
dependence. If time/iter is flat in S, Mosaic/TPU overlaps independent
chains and a multi-stream packet kernel wins; if it scales with S,
every dynamic VMEM load is serialized and the per-pop latency is a hard
floor.

Variants:
  chase      pure pointer chase (load + extract)
  chase+vec  adds a (64,128) slab-test-sized vector stage per step whose
             result feeds a cross-lane reduce consumed by the next index
             (models node_step's full dependence)
  chase+smem adds an SMEM store+load in the chain (models the stack)
"""
import functools
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 2048
NN = 1024


def _kernel(tab_ref, out_ref, smem, streams, mode):
    def body(c):
        i = c[0]
        idxs = list(c[1:1 + streams])
        accs = list(c[1 + streams:])
        for s in range(streams):
            row = tab_ref[pl.ds(idxs[s], 1), :]
            if mode == "chase+vec":
                # 64,128 vector stage fed by the row, feeding the next
                # index through a cross-lane reduce (node_step analog)
                v = jnp.broadcast_to(row, (64, 128)) * 1.000001
                v = jnp.minimum(v * 1.5, v + accs[s])
                m = jnp.min(v)  # cross-lane+sublane reduce -> scalar
                nxt = jax.lax.bitcast_convert_type(
                    row, jnp.int32)[0, 0] + (m > 1e30).astype(jnp.int32)
                accs[s] = v
            else:
                nxt = jax.lax.bitcast_convert_type(row, jnp.int32)[0, 0]
            if mode == "chase+smem":
                smem[s] = nxt
                nxt = smem[s]
            idxs[s] = nxt
        return tuple([i + 1] + idxs + accs)

    def cond(c):
        return c[0] < N

    init = [jnp.int32(0)] + [jnp.int32(s * 37 % NN)
                             for s in range(streams)]
    init += [jnp.zeros((64, 128), jnp.float32) for _ in range(streams)]
    out = jax.lax.while_loop(cond, body, tuple(init))
    acc = jnp.int32(0)
    for s in range(streams):
        acc = acc + out[1 + s]
    out_ref[0] = acc


def run(mode, streams):
    # random permutation as int32 bit patterns in an f32 table
    rng = np.random.default_rng(0)
    perm = rng.permutation(NN).astype(np.int32)
    tab = np.zeros((NN, 128), np.float32)
    tab[:, 0] = perm.view(np.float32)
    tab = jnp.asarray(tab)
    fn = pl.pallas_call(
        functools.partial(_kernel, streams=streams, mode=mode),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((max(streams, 1),), jnp.int32)],
    )
    fj = jax.jit(fn)
    o = fj(tab)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(10):
        o = fj(tab)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / 10
    print(f"{mode:>10} S={streams}: {dt / N * 1e9:7.1f} ns/iter "
          f"({dt / N / streams * 1e9:6.1f} ns/chain-step)", flush=True)


for mode in ("chase", "chase+smem", "chase+vec"):
    for s in (1, 2, 4):
        run(mode, s)
