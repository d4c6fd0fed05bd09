#!/usr/bin/env python
"""Bisect which structural feature of the packet kernel's while body
costs ~1.5us/iter when the primitives (dependent load+reduce chain) cost
~15ns (probe_chain.py).

Features, composable:
  carry5    five (64,128) f32 loop-carried buffers updated via where()
  cond      the vector stage sits inside lax.cond(code>0, ...) with a
            trivial else branch (the node/leaf dispatch analog)
  datacond  while-cond also depends on a body-computed scalar
  sort      19-swap scalar sorting network + 8 extracts per iter
  push8     8 predicated SMEM stores + pointer arithmetic per iter
"""
import functools
import itertools
import sys
sys.path.insert(0, "/root/repo")
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


def _kernel(tab_ref, out_ref, smem, feats):
    carry5 = "carry5" in feats
    ncarry = 5 if carry5 else 1

    def vec_stage(row, bufs):
        v = jnp.broadcast_to(row, (64, 128)) * 1.000001
        v = jnp.minimum(v * 1.5, v + bufs[0])
        m = jnp.min(v)
        nxt = jax.lax.bitcast_convert_type(row, jnp.int32)[0, 0] \
            + (m > 1e30).astype(jnp.int32)
        mask = v < 0.5
        outs = [jnp.where(mask, v, b) for b in bufs]
        return nxt, outs

    def body(c):
        i, idx = c[0], c[1]
        bufs = list(c[2:2 + ncarry])
        row = tab_ref[pl.ds(idx, 1), :]
        if "cond" in feats:
            def yes(_):
                return vec_stage(row, bufs)

            def no(_):
                return idx + 1, list(bufs)
            nxt, bufs = jax.lax.cond(idx >= 0, yes, no, None)
        else:
            nxt, bufs = vec_stage(row, bufs)
        if "sort" in feats:
            ri = jax.lax.bitcast_convert_type(row, jnp.int32)
            keys = [row[0, 8 + k] for k in range(8)]
            kids = [ri[0, 16 + k] for k in range(8)]
            from rodent_tpu.traversal.tiled import _SORT_NETWORKS
            for a, b in _SORT_NETWORKS[8]:
                sw = keys[a] > keys[b]
                keys[a], keys[b] = (jnp.where(sw, keys[b], keys[a]),
                                    jnp.where(sw, keys[a], keys[b]))
                kids[a], kids[b] = (jnp.where(sw, kids[b], kids[a]),
                                    jnp.where(sw, kids[a], kids[b]))
            nxt = nxt + (kids[0] & 0)
        if "push8" in feats:
            ri = jax.lax.bitcast_convert_type(row, jnp.int32)
            sp = smem[8]
            for k in range(8):
                val = ri[0, 32 + k]
                ok = val != 0
                smem[jnp.where(ok, jnp.minimum(sp, 7), 7)] = val
                sp = sp + jnp.where(ok, 1, 0)
            smem[8] = sp - 8
            nxt = nxt + (sp & 0)
        return tuple([i + 1, nxt] + bufs)

    def cond(c):
        ok = c[0] < N
        if "datacond" in feats:
            ok = ok & (c[1] < NN)
        return ok

    smem[8] = jnp.int32(0)
    init = [jnp.int32(0), jnp.int32(0)]
    init += [jnp.full((64, 128), float(k), jnp.float32)
             for k in range(ncarry)]
    out = jax.lax.while_loop(cond, body, tuple(init))
    out_ref[0] = out[1] + out[0]


def run(feats):
    rng = np.random.default_rng(0)
    perm = rng.permutation(NN).astype(np.int32)
    tab = np.zeros((NN, 128), np.float32)
    tab[:, 0] = perm.view(np.float32)
    tab[:, 8:16] = rng.random((NN, 8), np.float32)
    tab[:, 16:24] = 1.0
    tab[:, 32:40] = 1.0
    tab = jnp.asarray(tab)
    fn = pl.pallas_call(
        functools.partial(_kernel, feats=feats),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((16,), jnp.int32)],
    )
    fj = jax.jit(fn)
    o = fj(tab)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(10):
        o = fj(tab)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / 10
    print(f"{'+'.join(feats) or 'base':>32}: {dt / N * 1e9:7.1f} ns/iter",
          flush=True)


CASES = [
    (),
    ("carry5",),
    ("cond",),
    ("datacond",),
    ("sort",),
    ("push8",),
    ("cond", "carry5"),
    ("sort", "push8"),
    ("cond", "carry5", "sort", "push8", "datacond"),
]
for f in CASES:
    run(tuple(f))
