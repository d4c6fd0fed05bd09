#!/usr/bin/env python
"""Same-scale powerplant (reference scale ~12.7M tris) with the round-5
HBM-tier build (Tri24 multi-line leaf packets + cheap DP leaves).

The round-4 giga rows (results_tpu_r4.txt) ran 3.82/1.88/0.97 Mrays/s
(primary/ao/bounces) with BOTH tables in HBM because the pk8 node table
(~420K rows = 94 MB) exceeded VMEM. The round-5 build shrinks nodes
~4.7x (pk24 lc0.45: 28K rows at 4.3M tris), so the same-scale scene's
node table fits VMEM and the scene drops a whole tier: hbm mode (nodes
resident, Tri DMA) instead of giga (every pop a DMA).

Usage: python experiments/bigscene_12m.py [--target 14600000]
       [--packet 24] [--lc 0.45] [--modes hbm,giga]
"""
import sys
sys.path.insert(0, "/root/repo")
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=int, default=14_600_000)
    ap.add_argument("--packet", type=int, default=24)
    ap.add_argument("--lc", type=float, default=0.45)
    ap.add_argument("--modes", default="hbm,giga")
    ap.add_argument("--dists", default="primary,ao,bounces")
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from rodent_tpu.accel import build_bvh
    from rodent_tpu.traversal.api import bvh_to_device, make_rays
    from rodent_tpu.traversal import pallas_packet as pp
    from rodent_tpu.traversal.sorting import sort_rays
    from rodent_tpu.utils import testscenes
    from rodent_tpu.utils.testscenes import (make_powerplant,
                                             powerplant_primary_rays,
                                             hall_secondary_rays)

    verts, idx = make_powerplant(args.target)
    t0 = time.time()
    bvh = build_bvh(verts, idx, arity=8, packet=args.packet, quality=0,
                    leaf_threshold=12, leaf_cost=args.lc)
    dev = bvh_to_device(bvh)
    nodes_mb = bvh.num_nodes * 7 * 8 * 4 / 1e6
    print(f"tris={len(idx)//4} nodes={bvh.num_nodes} "
          f"({nodes_mb:.0f} MB) packets={bvh.num_packets} "
          f"tri_mb={bvh.num_packets*14*args.packet*4/1e6:.0f} "
          f"build={time.time()-t0:.0f}s backend={jax.default_backend()}",
          flush=True)

    org, dirs = powerplant_primary_rays(1024, 1024)
    n = len(org)
    lo, hi = verts.min(0), verts.max(0)
    prim = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                     jnp.zeros(n, jnp.float32),
                     jnp.full(n, 3.402823466e38, jnp.float32))

    # secondary distributions from a primary trace (benchmark.py recipe)
    hit = pp.traverse_packet(dev, prim, tris_hbm=True,
                             nodes_hbm=nodes_mb > 90, prefetch=True)
    t = np.asarray(hit["t"])
    pid = np.asarray(hit["prim_id"])
    t = np.where(pid >= 0, t, 1.0)
    hp = org + dirs * t[:, None]
    i4 = idx.reshape(-1, 4)
    tri = np.maximum(pid, 0)
    v0, v1, v2 = verts[i4[tri, 0]], verts[i4[tri, 1]], verts[i4[tri, 2]]
    fn = np.cross(v0 - v1, v2 - v0)
    fn = np.where((fn * dirs).sum(1, keepdims=True) > 0, -fn, fn)

    dists = {}
    if "primary" in args.dists:
        dists["primary"] = (prim, False)
    for kind, ah in (("ao", True), ("bounces", False)):
        if kind in args.dists:
            o2, d2, tmax2 = hall_secondary_rays(kind, hp, fn)
            dists[kind] = (make_rays(jnp.asarray(o2), jnp.asarray(d2),
                                     jnp.full(n, 1e-3, jnp.float32),
                                     jnp.asarray(tmax2)), ah)

    for dist, (rays, ah) in dists.items():
        srt, _ = sort_rays(rays, lo, hi)
        for mode in args.modes.split(","):
            nh = mode == "giga"
            if not nh and nodes_mb > 90:
                print(f"{dist} : hbm : skipped (nodes {nodes_mb:.0f} MB "
                      f"> VMEM)", flush=True)
                continue
            fn_t = jax.jit(lambda d, r, a=ah, g=nh: pp.traverse_packet(
                d, r, any_hit=a, tris_hbm=True, nodes_hbm=g,
                prefetch=True))
            try:
                out = fn_t(dev, srt)
                _ = np.asarray(out["t"][:8])
            except Exception as e:
                print(f"{dist} : {mode} : FAILED {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)
                continue
            ss = []
            for _b in range(args.blocks):
                t1 = time.perf_counter()
                for _ in range(args.iters):
                    out = fn_t(dev, srt)
                _ = np.asarray(out["t"][:8])
                ss.append(n * args.iters
                          / (time.perf_counter() - t1) / 1e6)
            ss.sort()
            hits = int(np.asarray(out["prim_id"] >= 0).sum())
            print(f"{dist} : {mode} : {ss[len(ss)//2]:.2f} Mrays "
                  f"(min {ss[0]:.2f} max {ss[-1]:.2f}; "
                  f"{hits} intersections)", flush=True)


if __name__ == "__main__":
    main()
