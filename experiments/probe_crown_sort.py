#!/usr/bin/env python
"""Crown-primary mitigation probe (VERDICT r4 item 7).

Crown's 11x tile-union expansion is attributed (attribute_crown.py):
2048 rays share one packet-kernel stack and the high-depth-complexity
crown makes their visited-node UNION huge. The untried mitigation
consistent with that: fewer rays per shared stack (narrow tiles x deep
multi interleave to keep the VLIW packed) plus a DEPTH-LAYER-AWARE sort
key — order rays by the leaf they actually hit (cheap prepass) instead
of by origin cone, so a tile's rays walk the same subtree.

Grid: sort in {cone, hit-prim, hit-page, t-bucket} x config in
{32x1ct, 16x2, 8x4, 8x2, 4x4} on crown PRIMARY. The prepass cost is
EXCLUDED (this probes the ceiling; a production two-pass would reuse
frame coherence). Done criterion: crown >= 35 Mrays/s or the grid
checked into results_tpu_r5.txt and the ceiling accepted.

Usage: python experiments/probe_crown_sort.py [--tris 800000]
       [--blocks 3] [--iters 3]
"""
import sys
sys.path.insert(0, "/root/repo")
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=800_000)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--configs", default="32x1ct,32x1,16x2,8x4,8x2,4x4")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from rodent_tpu.accel import build_bvh
    from rodent_tpu.traversal.api import bvh_to_device, make_rays
    from rodent_tpu.traversal import pallas_packet as pp
    from rodent_tpu.traversal.sorting import sort_rays, ray_sort_keys
    from rodent_tpu.utils.testscenes import make_crown, crown_primary_rays

    verts, idx = make_crown(args.tris)
    bvh = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
    dev = bvh_to_device(bvh)
    org, dirs = crown_primary_rays(1024, 1024)
    n = len(org)
    rays = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                     jnp.zeros(n, jnp.float32),
                     jnp.full(n, 3.402823466e38, jnp.float32))
    lo, hi = verts.min(0), verts.max(0)
    print(f"tris={len(idx)//4} nodes={bvh.num_nodes} "
          f"packets={bvh.num_packets} backend={jax.default_backend()}",
          flush=True)

    # prepass: one exact trace for the depth-layer keys
    pre = pp.traverse_packet(dev, rays, tile_rows=16, multi=2)
    pid = np.asarray(pre["prim_id"])
    tt = np.asarray(pre["t"])
    cone = np.asarray(ray_sort_keys(rays["org"], rays["dir"], lo, hi))

    orders = {
        "cone": np.argsort(cone, kind="stable"),
        # hit-prim: rays hitting the same triangle are adjacent; misses
        # (pid -1) group together at the front — fine, they die fast
        "hit-prim": np.argsort(pid.astype(np.int64) * (1 << 20)
                               + (cone >> 12), kind="stable"),
        # hit-page: 4096-consecutive-prim pages (SBVH order clusters
        # prim ids by subtree) — groups whole subtrees; ties broken by
        # the cone key so tiles stay directionally coherent
        "hit-page": np.argsort((pid.astype(np.int64) // 4096) * (1 << 32)
                               + cone, kind="stable"),
        # t-bucket: depth layer by hit distance (32 buckets) x cone
        "t-bucket": np.argsort(
            (np.minimum(tt / max(float(tt[pid >= 0].max()), 1e-6), 1.0)
             * 31).astype(np.int64) * (1 << 32) + cone, kind="stable"),
    }

    def take(order):
        o = jnp.asarray(order)
        return {k: v[o] for k, v in rays.items()}

    configs = []
    for c in args.configs.split(","):
        ct = c.endswith("ct")
        r, m = (int(x) for x in c[:-2].split("x")) if ct \
            else (int(x) for x in c.split("x"))
        configs.append((c, r, m, ct))

    for sname, order in orders.items():
        srt = take(order)
        for cname, r, m, ct in configs:
            fn = jax.jit(lambda d, ra, tr=r, mm=m, cc=ct:
                         pp.traverse_packet(d, ra, tile_rows=tr,
                                            multi=mm, carry_top=cc))
            try:
                out = fn(dev, srt)
                _ = np.asarray(out["t"][:8])
            except Exception as e:
                print(f"{sname:>9} {cname:>6}: FAILED "
                      f"{type(e).__name__}", flush=True)
                continue
            ss = []
            for _b in range(args.blocks):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = fn(dev, srt)
                _ = np.asarray(out["t"][:8])
                ss.append(n * args.iters
                          / (time.perf_counter() - t0) / 1e6)
            ss.sort()
            print(f"{sname:>9} {cname:>6}: {ss[len(ss)//2]:7.2f} Mrays/s "
                  f"(min {ss[0]:.2f} max {ss[-1]:.2f})", flush=True)


if __name__ == "__main__":
    main()
