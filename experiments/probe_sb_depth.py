#!/usr/bin/env python
"""Sub-batch depth probe on the bench ao/bounces rows (round 5): the
waterfall measured sb4<sb8<sb16 monotone; find the knee. Deeper chunking
tightens each chunk's max-trip bound (chunks of 8192/k rows share a
sorted trip-count neighborhood) but serializes more lax.map steps and
re-pays the per-chunk fixed cost (compile-once body, but launch/fusion
overhead per step).

Usage: python experiments/probe_sb_depth.py [--subs 16,24,32,64]
"""
import sys
sys.path.insert(0, "/root/repo")
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subs", default="16,32,64")
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from rodent_tpu.accel import build_bvh
    from rodent_tpu.traversal.api import bvh_to_device, make_rays
    from rodent_tpu.traversal.pallas_packet import traverse_packet
    from rodent_tpu.traversal.sorting import sort_rays
    from rodent_tpu.traversal.tiled import traverse_tiled
    from rodent_tpu.utils.testscenes import (hall_primary_rays, make_hall,
                                             secondary_rays_from_trace)

    verts, idx = make_hall(260_000)
    bvh = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
    dev = bvh_to_device(bvh)
    org, dirs = hall_primary_rays(1024, 1024)
    n = len(org)
    prim = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                     jnp.zeros(n, jnp.float32),
                     jnp.full(n, 3.402823466e38, jnp.float32))
    hit = traverse_packet(dev, prim)
    t = np.asarray(hit["t"])
    pid = np.asarray(hit["prim_id"])
    print(f"backend={jax.default_backend()} tris={len(idx)//4}",
          flush=True)

    for kind in ("ao", "bounces"):
        any_hit = kind == "ao"
        o2, d2, tmin2, tmax2 = secondary_rays_from_trace(
            kind, org, dirs, t, pid, verts, idx.reshape(-1, 4))
        rays = make_rays(jnp.asarray(o2), jnp.asarray(d2),
                         jnp.asarray(tmin2), jnp.asarray(tmax2))
        rays, _ = sort_rays(rays, verts.min(0), verts.max(0))
        print(f"== {kind}", flush=True)
        for sb in [int(x) for x in args.subs.split(",")]:
            f = jax.jit(lambda r, s=sb: traverse_tiled(
                dev, r, any_hit=any_hit, compact_stages=5,
                sub_batches=s))
            out = f(rays)
            # block_until_ready returns EARLY on the lax.map programs of
            # this remote backend (same quirk as bench.py's bigscene
            # row): a tiny sync fetch is the only reliable barrier
            _ = np.asarray(out["t"][:128])
            ss = []
            for _ in range(args.blocks):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = f(rays)
                _ = np.asarray(out["t"][:128])
                ss.append(n * args.iters
                          / (time.perf_counter() - t0) / 1e6)
            ss.sort()
            print(f"  sb{sb:<3}-c5: {ss[len(ss)//2]:6.2f} Mrays/s "
                  f"[{ss[0]:.2f}, {ss[-1]:.2f}]", flush=True)


if __name__ == "__main__":
    main()
