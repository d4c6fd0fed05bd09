#!/usr/bin/env python
"""Per-pop cost bisection of the pair kernel via ablations (results are
WRONG for most ablations; timing only)."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
from rodent_tpu.accel import build_bvh
from rodent_tpu.traversal.api import bvh_to_device, make_rays
from experiments import pallas_pair as pp3
from rodent_tpu.traversal.sorting import sort_rays
from rodent_tpu.utils.testscenes import hall_primary_rays, make_hall

verts, idx = make_hall(260_000)
bvh = build_bvh(verts, idx, arity=8, packet=8)
dev = pp3.pair_device(bvh)
org, dirs = hall_primary_rays(1024, 1024)
n = len(org)
prim = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                 jnp.zeros(n, jnp.float32),
                 jnp.full(n, 3.402823466e38, jnp.float32))
rays, _ = sort_rays(prim, verts.min(0), verts.max(0))

CASES = [
    (),
    ("noleaf",),
    ("nonode",),
    ("nomatmul",),
    ("fastmatmul",),
    ("nostrip",),
    ("nosort",),
    ("noleaf", "nomatmul"),
    ("noleaf", "nonode"),
]
for ab in CASES:
    fn = jax.jit(lambda r, ab=ab: pp3.traverse_pair(
        dev, r, tile_rays=2048, streams=1, ablate=ab))
    out = fn(rays)
    jax.block_until_ready(out["t"])
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(rays)
    jax.block_until_ready(out["t"])
    dt = (time.perf_counter() - t0) / 3
    outc = pp3.traverse_pair(dev, rays, tile_rays=2048, streams=1,
                             count_pops=True, ablate=ab)
    tot = int(np.asarray(outc["pops"]).sum())
    print(f"{','.join(ab) or 'baseline':>22}: {n/dt/1e6:6.1f} Mrays/s "
          f"{dt/tot*1e9:7.0f} ns/pop  ({tot} pops)", flush=True)
