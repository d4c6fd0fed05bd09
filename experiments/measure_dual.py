"""Dual-tile packet kernel: parity + throughput vs the single-tile kernel.

Usage: python experiments/measure_dual.py [--cpu]   (--cpu = parity only,
interpret mode). On TPU: hall-260K primary/ao/bounces at rows 16/32,
median-of-5, vs the single-tile kernel at the same rows.
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

p = argparse.ArgumentParser()
p.add_argument("--cpu", action="store_true")
p.add_argument("--n", type=int, default=1 << 20)
p.add_argument("--combos", type=str, nargs="*",
               default=["32x1", "16x2", "8x2", "8x4", "4x4", "4x8"],
               help="tile_rows x multi")
args = p.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp

from rodent_tpu.accel import build_bvh
from rodent_tpu.traversal.api import bvh_to_device, make_rays, traverse
from rodent_tpu.traversal.pallas_packet import traverse_packet
from rodent_tpu.traversal.sorting import sort_rays
from rodent_tpu.utils.compile import rjit
from rodent_tpu.utils.testscenes import (make_hall, hall_primary_rays,
                                         hall_secondary_rays)

if args.cpu:
    # parity on a small scene, interpret-mode kernel
    verts, idx = make_hall(2_000)
    n = 4096
else:
    verts, idx = make_hall(260_000)
    n = args.n
bvh = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
dev = bvh_to_device(bvh)
lo, hi = verts.min(0), verts.max(0)

side = int(np.sqrt(n))
org, dirs = hall_primary_rays(side, n // side)
n = len(org)
prim = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                 jnp.zeros(n, jnp.float32),
                 jnp.full(n, 3.402823466e38, jnp.float32))

if args.cpu:
    ref = traverse(dev, prim)
    got = traverse_packet(dev, prim, multi=4, interpret=True,
                          tile_rows=4)
    for k in ("t", "prim_id"):
        a, b = np.asarray(ref[k]), np.asarray(got[k])
        ok = np.allclose(a, b, rtol=1e-5, atol=1e-5)
        print(f"parity closest {k}: {'OK' if ok else 'MISMATCH'} "
              f"({np.sum(a != b)} diffs)")
        assert ok
    got = traverse_packet(dev, prim, multi=4, interpret=True,
                          tile_rows=4, any_hit=True)
    ref = traverse(dev, prim, any_hit=True)
    a = np.asarray(ref["prim_id"]) >= 0
    b = np.asarray(got["prim_id"]) >= 0
    print(f"parity any-hit: {'OK' if (a == b).all() else 'MISMATCH'} "
          f"({np.sum(a != b)} diffs)")
    assert (a == b).all()
    print("CPU parity OK")
    sys.exit(0)

# hit point + normal for secondaries
hit = traverse_packet(dev, prim)
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


def bench(fn, rays, reps=5):
    # bench.py-style: dev closed over, `reps` pipelined calls, one sync
    # at the end (per-call fetches cost ~30 ms through the tunnel and
    # bury a 15-20 ms kernel)
    out = fn(rays)
    jax.block_until_ready(out["t"])
    t0 = time.perf_counter()
    for _i in range(reps):
        out = fn(rays)
    jax.block_until_ready(out["t"])
    _ = np.asarray(out["t"][:64])
    return n * reps / (time.perf_counter() - t0) / 1e6, out


for name, (rays, ah) in cases.items():
    srt, _ = sort_rays(rays, lo, hi)
    ref_pid = None
    for combo in args.combos:
        rows, mu = [int(x) for x in combo.split("x")]
        f = rjit(lambda r, a=ah, tr=rows, m_=mu: traverse_packet(
            dev, r, any_hit=a, tile_rows=tr, multi=m_))
        mr, o = bench(f, srt)
        pid = np.asarray(o["prim_id"])
        if ah:
            pid = (pid >= 0).astype(np.int32)
        if ref_pid is None:
            ref_pid = pid
            diffs = 0
        else:
            diffs = int(np.sum(pid != ref_pid))
        print(f"{name:8s} rows={rows:3d} multi={mu}: {mr:6.2f} Mrays/s "
              f"({diffs} hit diffs)", flush=True)
