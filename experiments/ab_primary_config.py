#!/usr/bin/env python
"""Variance-controlled rows x multi A/B on the headline primary workload.

Round-4 VERDICT item 3: the 16x2 default came from a single-run claim
that the crashed round-3 sweep never confirmed, and identical builds
read 60.1-70.3 Mrays/s run to run. This measures each candidate config
as the median of `--blocks` independent timed blocks (bench.py /
bench_traversal.cpp:336-391 semantics) in ONE session, interleaving the
configs round-robin so slow drift (thermal, tunnel) hits all configs
equally instead of biasing whichever ran last.

Usage: python experiments/ab_primary_config.py [--configs 16x1,16x2,...]
       [--blocks 5] [--iters 5] [--dist primary|ao|bounces]
"""
import sys
sys.path.insert(0, "/root/repo")
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="16x1,16x2,24x2,24x3,32x1,32x3")
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dist", default="primary")
    ap.add_argument("--tris", type=int, default=260_000)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from rodent_tpu.accel import build_bvh
    from rodent_tpu.traversal.api import bvh_to_device, make_rays
    from rodent_tpu.traversal import pallas_packet as pp
    from rodent_tpu.traversal.sorting import sort_rays
    from rodent_tpu.utils.testscenes import (hall_primary_rays, make_hall,
                                             secondary_rays_from_trace)

    verts, idx = make_hall(args.tris)
    bvh = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
    dev = bvh_to_device(bvh)
    side = 1024
    org, dirs = hall_primary_rays(side, side)
    n = len(org)
    prim = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                     jnp.zeros(n, jnp.float32),
                     jnp.full(n, 3.402823466e38, jnp.float32))
    any_hit = args.dist == "ao"
    if args.dist == "primary":
        rays, _ = sort_rays(prim, verts.min(0), verts.max(0))
    else:
        hit_un = pp.traverse_packet(dev, prim)
        o2, d2, tmin2, tmax2 = secondary_rays_from_trace(
            args.dist, org, dirs, np.asarray(hit_un["t"]),
            np.asarray(hit_un["prim_id"]), verts, idx.reshape(-1, 4))
        rays = make_rays(jnp.asarray(o2), jnp.asarray(d2),
                         jnp.asarray(tmin2), jnp.asarray(tmax2))
        rays, _ = sort_rays(rays, verts.min(0), verts.max(0))

    configs = []
    for c in args.configs.split(","):
        r, m = c.split("x")
        configs.append((int(r), int(m)))
    print(f"dist={args.dist} nodes={bvh.num_nodes} "
          f"packets={bvh.num_packets} backend={jax.default_backend()} "
          f"blocks={args.blocks} iters={args.iters}")

    fns = {}
    for r, m in configs:
        fns[(r, m)] = jax.jit(lambda ra, tr=r, mm=m: pp.traverse_packet(
            dev, ra, any_hit=any_hit, tile_rows=tr, multi=mm))
        out = fns[(r, m)](rays)         # compile + warm
        _ = np.asarray(out["t"][:8])

    samples = {c: [] for c in configs}
    for _b in range(args.blocks):       # round-robin: drift hits all
        for c in configs:
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fns[c](rays)
            _ = np.asarray(out["t"][:8])
            samples[c].append(n * args.iters
                              / (time.perf_counter() - t0) / 1e6)
    for c in configs:
        s = sorted(samples[c])
        print(f"{c[0]:>3}x{c[1]} {s[len(s) // 2]:>7.2f} Mrays/s "
              f"(min {s[0]:.2f} max {s[-1]:.2f})")


if __name__ == "__main__":
    main()
