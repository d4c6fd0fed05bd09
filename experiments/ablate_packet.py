#!/usr/bin/env python
"""Per-pop cost bisection of the PACKET kernel (v2) via ablations.

nonodetest: push all children without slab tests  (correct hits, more pops)
noleaftest: skip leaf MT vector work               (wrong hits)

ns/pop (normalized by each variant's own pop count) isolates where the
per-pop time goes: node slab tests, leaf MT tests, or loop overhead.
"""
import time
import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from rodent_tpu.accel import build_bvh
from rodent_tpu.traversal.api import bvh_to_device, make_rays
from rodent_tpu.traversal import pallas_packet as pp
from rodent_tpu.traversal.sorting import sort_rays
from rodent_tpu.utils.testscenes import hall_primary_rays, make_hall

verts, idx = make_hall(260_000)
bvh = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
dev = bvh_to_device(bvh)
org, dirs = hall_primary_rays(1024, 1024)
n = len(org)
prim = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                 jnp.zeros(n, jnp.float32),
                 jnp.full(n, 3.402823466e38, jnp.float32))
rays, _ = sort_rays(prim, verts.min(0), verts.max(0))

import sys
sys.path.insert(0, "/root/repo")
CASES = [(), ("nonodetest",), ("noleaftest",),
         ("nonodetest", "noleaftest")]
if len(sys.argv) > 1:
    CASES = [tuple(x.split(",")) if x else () for x in sys.argv[1:]]
for ab in CASES:
    # multi=1 everywhere: ablations only exist in the single-tile body
    # (ablated rows would demote anyway; the baseline must match)
    fn = jax.jit(lambda r, ab=ab: pp.traverse_packet(
        dev, r, tile_rows=32, multi=1, ablate=ab))
    out = fn(rays)
    jax.block_until_ready(out["t"])
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(rays)
    jax.block_until_ready(out["t"])
    dt = (time.perf_counter() - t0) / 3
    # pop counts via the count_pops variant (uncached -> slow compile;
    # reuse across runs via the persistent cache)
    from rodent_tpu.traversal.pallas_packet import _call_kernel, pack_rays
    packed, nt = pack_rays(rays, 32)
    outs = _call_kernel(dev, packed, nt, 32, False, False,
                        count_pops=True, ablate=ab)
    cnt = np.asarray(outs[5])[::8, 0]      # one per tile
    tot = int(cnt.sum())
    print(f"{','.join(ab) or 'baseline':>24}: {n/dt/1e6:6.1f} Mrays/s  "
          f"pops/tile {cnt.mean():7.0f}  ns/pop {dt/tot*1e9:6.0f}",
          flush=True)
