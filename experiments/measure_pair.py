#!/usr/bin/env python
"""Pair kernel (v3) vs packet kernel (v2) on the hall workloads."""
import sys
sys.path.insert(0, "/root/repo")
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=260_000)
    ap.add_argument("--tiles", default="1024,2048")
    ap.add_argument("--streams", default="1,2,4,8")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from rodent_tpu.accel import build_bvh
    from rodent_tpu.traversal.api import bvh_to_device, make_rays
    from experiments import pallas_pair as pp3
    from rodent_tpu.traversal.pallas_packet import traverse_packet
    from rodent_tpu.traversal.sorting import (_morton10, ray_octant,
                                              sort_rays)
    from rodent_tpu.utils.testscenes import (hall_primary_rays, make_hall,
                                             hall_secondary_rays)

    verts, idx = make_hall(args.tris)
    bvh = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
    dev = pp3.pair_device(bvh)
    lo, hi = verts.min(0), verts.max(0)
    print(f"nodes={bvh.num_nodes} packets={bvh.num_packets} "
          f"backend={jax.default_backend()}")

    org, dirs = hall_primary_rays(1024, 1024)
    n = len(org)
    prim = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                     jnp.zeros(n, jnp.float32),
                     jnp.full(n, 3.402823466e38, jnp.float32))
    prim_s, _ = sort_rays(prim, lo, hi)

    hit_un = traverse_packet(dev, prim)
    t = np.asarray(hit_un["t"])
    pid = np.asarray(hit_un["prim_id"])
    t = np.where(pid >= 0, t, 1.0)
    hp = org + dirs * t[:, None]
    i4 = idx.reshape(-1, 4)
    tri = np.maximum(pid, 0)
    v0, v1, v2 = verts[i4[tri, 0]], verts[i4[tri, 1]], verts[i4[tri, 2]]
    fnrm = np.cross(v0 - v1, v2 - v0)
    fnrm = np.where((fnrm * dirs).sum(1, keepdims=True) > 0, -fnrm, fnrm)

    def org9_key(o, d):
        oct_ = ray_octant(jnp.asarray(d)).astype(jnp.uint32)
        q = []
        for i in range(3):
            tq = (o[:, i] - lo[i]) / max(hi[i] - lo[i], 1e-30)
            q.append(jnp.clip(jnp.asarray(tq) * 1024.0, 0,
                              1023).astype(jnp.uint32))
        om = (_morton10(q[0]) | (_morton10(q[1]) << 1)
              | (_morton10(q[2]) << 2))
        dq = [jnp.clip((jnp.asarray(d[:, i]) + 1) * 512, 0,
                       1023).astype(jnp.uint32) for i in range(3)]
        dm = (_morton10(dq[0]) | (_morton10(dq[1]) << 1)
              | (_morton10(dq[2]) << 2))
        return ((om >> 21) << 22) | (oct_ << 19) | (dm >> 11)

    dists = {"primary": (prim_s, False)}
    for kind, any_hit in (("ao", True), ("bounces", False)):
        o2, d2, tmax2 = hall_secondary_rays(kind, hp, fnrm)
        rays2 = make_rays(jnp.asarray(o2), jnp.asarray(d2),
                          jnp.full(n, 1e-3, jnp.float32),
                          jnp.asarray(tmax2))
        perm = jnp.argsort(org9_key(o2, d2))
        dists[kind] = ({k: v[perm] for k, v in rays2.items()}, any_hit)

    tiles = [int(x) for x in args.tiles.split(",")]
    slist = [int(x) for x in args.streams.split(",")]
    print(f"{'dist':>8} {'tile':>6} {'S':>3} {'Mrays/s':>8} "
          f"{'pops/blk':>9} {'ns/pop':>8}")
    for name, (rays, any_hit) in dists.items():
        for tr in tiles:
            for S in slist:
                fn = jax.jit(lambda r, ah=any_hit, t=tr, S=S:
                             pp3.traverse_pair(dev, r, any_hit=ah,
                                               tile_rays=t, streams=S))
                out = fn(rays)
                jax.block_until_ready(out["t"])
                iters = 3
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = fn(rays)
                jax.block_until_ready(out["t"])
                dt = (time.perf_counter() - t0) / iters
                mrays = n / dt / 1e6
                outc = pp3.traverse_pair(dev, rays, any_hit=any_hit,
                                         tile_rays=tr, streams=S,
                                         count_pops=True)
                cnt = np.asarray(outc["pops"])
                tot = int(cnt.sum())
                print(f"{name:>8} {tr:>6} {S:>3} {mrays:>8.1f} "
                      f"{cnt.mean():>9.0f} {dt/tot*1e9:>8.0f}",
                      flush=True)


if __name__ == "__main__":
    main()
