"""Attribute the dual-queue loop cost: trips, leaf-unit fire rate, mean
utilization, and per-trip cost on hall ao/bounces/primary (1M rays)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp

from rodent_tpu.accel import build_bvh
from rodent_tpu.traversal.api import bvh_to_device, make_rays
from rodent_tpu.traversal.tiled import traverse_tiled
from rodent_tpu.traversal.sorting import sort_rays
from rodent_tpu.utils.compile import rjit
from rodent_tpu.utils.testscenes import (make_hall, hall_primary_rays,
                                         hall_secondary_rays)

verts, idx = make_hall(260_000)
bvh = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
dev = bvh_to_device(bvh)
print(f"meta: shared={dev['meta'].shared_stack} "
      f"node={dev['meta'].node_stack}")
lo, hi = verts.min(0), verts.max(0)
org, dirs = hall_primary_rays(1024, 1024)
n = len(org)
prim = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                 jnp.zeros(n, jnp.float32),
                 jnp.full(n, 3.402823466e38, jnp.float32))
hit = traverse_tiled(dev, prim)
t = np.asarray(hit["t"])
pid = np.asarray(hit["prim_id"])
t = np.where(pid >= 0, t, 1.0)
hp = org + dirs * t[:, None]
i4 = idx.reshape(-1, 4)
tri = np.maximum(pid, 0)
v0, v1, v2 = verts[i4[tri, 0]], verts[i4[tri, 1]], verts[i4[tri, 2]]
fn = np.cross(v0 - v1, v2 - v0)
fn = np.where((fn * dirs).sum(1, keepdims=True) > 0, -fn, fn)

cases = {"primary": (prim, False)}
for kind, ah in (("ao", True), ("bounces", False)):
    o2, d2, tmax2 = hall_secondary_rays(kind, hp, fn)
    cases[kind] = (make_rays(jnp.asarray(o2), jnp.asarray(d2),
                             jnp.full(n, 1e-3, jnp.float32),
                             jnp.asarray(tmax2)), ah)

for name, (rays, ah) in cases.items():
    srt, _ = sort_rays(rays, lo, hi)
    f = rjit(lambda d, r, a=ah: traverse_tiled(d, r, any_hit=a,
                                               debug_counters=True))
    out = f(dev, srt)
    _ = np.asarray(out["t"][:64])
    times = []
    for _i in range(3):
        t0 = time.perf_counter()
        out = f(dev, srt)
        _ = np.asarray(out["t"][:64])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    c = {k: int(np.asarray(v)) for k, v in out["counters"].items()}
    iters = c["iters"]
    util = c["live_sum"] / (iters * n)
    print(f"{name:8s}: {dt*1e3:7.1f} ms ({n/dt/1e6:5.2f} Mrays/s)  "
          f"trips {iters:4d}  leaf-fired {c['leaf_iters']:4d}  "
          f"mean-util {util:.3f}  per-trip {dt/iters*1e3:6.2f} ms "
          f"({dt/iters/n*1e9:5.2f} ns/ray)", flush=True)
