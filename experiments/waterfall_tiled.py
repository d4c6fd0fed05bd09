#!/usr/bin/env python
"""ns/ray waterfall for the dual-queue lockstep engine (VERDICT r4
item 2): decompose traverse_tiled's cost on hall ao/bounces into
  - lockstep tail (trips beyond per-ray mean; utilization counters),
  - leaf-unit cost (gate, tri gather, MT lanes),
  - node gather vs slab math,
  - stack select chains (pop one-hot, push one-hot),
  - sort network,
then compare delivered Mrays/s against the useful-work floor from the
numpy per-ray pop counts.

Method: run the SAME loop for a FIXED trip count (fixed_iters = the
counted trips of the real run) under each ablation — identical schedule
by construction, so time deltas isolate per-trip component costs.
Ablated runs return wrong hits; only their time is used.

Usage: python experiments/waterfall_tiled.py [--tris 260000]
       [--blocks 3] [--iters 2] [--dist ao,bounces]
"""
import sys
sys.path.insert(0, "/root/repo")
import argparse
import time

import numpy as np


def timed(fn, *args, blocks=3, iters=2):
    import jax
    out = fn(*args)
    jax.block_until_ready(out["t"])
    ss = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out["t"])
        ss.append((time.perf_counter() - t0) / iters)
    ss.sort()
    return ss[len(ss) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=260_000)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--dist", default="ao,bounces")
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

    verts, idx = make_hall(args.tris)
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
    print(f"tris={len(idx)//4} nodes={bvh.num_nodes} "
          f"packets={bvh.num_packets} backend={jax.default_backend()}",
          flush=True)

    for kind in args.dist.split(","):
        any_hit = kind == "ao"
        o2, d2, tmin2, tmax2 = secondary_rays_from_trace(
            kind, org, dirs, t, pid, verts, idx.reshape(-1, 4))
        rays = make_rays(jnp.asarray(o2), jnp.asarray(d2),
                         jnp.asarray(tmin2), jnp.asarray(tmax2))
        rays, _ = sort_rays(rays, verts.min(0), verts.max(0))

        # ---- production baseline + counters ----
        f_prod = jax.jit(lambda d, r: traverse_tiled(
            d, r, any_hit=any_hit, compact_stages=5))
        t_prod = timed(f_prod, dev, rays, blocks=args.blocks,
                       iters=args.iters)
        f_cnt = jax.jit(lambda d, r: traverse_tiled(
            d, r, any_hit=any_hit, debug_counters=True))
        out = f_cnt(dev, rays)
        c = {k: float(v) for k, v in out["counters"].items()}
        trips = int(c["iters"])
        B = n
        # live_sum accumulates per-trip live-ray counts, so
        # utilization = mean live rays per trip / megabatch size
        util = c["live_sum"] / trips / B
        print(f"\n== {kind}: prod(tiled-c5) {n/t_prod/1e6:6.2f} Mrays/s "
              f"({t_prod*1e3:.1f} ms) | trips={trips} "
              f"leaf_trips={int(c['leaf_iters'])} util={util:.3f}",
              flush=True)

        # ---- fixed-schedule ablation waterfall (uncompacted loop) ----
        base = None
        rowsn = [("full", ()),
                 ("noleaf", ("noleaf",)),
                 ("leafalways", ("leafalways",)),
                 ("trigatherfix", ("trigatherfix",)),
                 ("nodegatherfix", ("nodegatherfix",)),
                 ("nosort", ("nosort",)),
                 ("nopush", ("nopush",)),
                 ("nopop", ("nopop",)),
                 ("barebones", ("noleaf", "nodegatherfix", "nosort",
                                "nopush", "nopop"))]
        for name, ab in rowsn:
            f = jax.jit(lambda d, r, a=tuple(ab): traverse_tiled(
                d, r, any_hit=any_hit, debug_counters=True,
                ablate=a, fixed_iters=trips))
            tt = timed(f, dev, rays, blocks=args.blocks,
                       iters=args.iters)
            if name == "full":
                base = tt
                print(f"  {name:>14}: {tt*1e3:7.1f} ms "
                      f"({tt/trips*1e6:7.1f} us/trip)", flush=True)
            else:
                print(f"  {name:>14}: {tt*1e3:7.1f} ms  "
                      f"delta {-(tt-base)*1e3:+7.1f} ms "
                      f"({-(tt-base)/base:+.0%})", flush=True)

        # ---- production candidates: sub-batches x compaction ----
        for sb, cs in ((0, 5), (4, 5), (8, 5), (16, 5), (8, 3),
                       (16, 0)):
            f = jax.jit(lambda d, r, s=sb, c=cs: traverse_tiled(
                d, r, any_hit=any_hit, sub_batches=s,
                compact_stages=c))
            try:
                tp = timed(f, dev, rays, blocks=args.blocks,
                           iters=args.iters)
            except Exception as e:
                print(f"  sb{sb}-c{cs}: FAILED {type(e).__name__}",
                      flush=True)
                continue
            print(f"  sb{sb}-c{cs}: {n/tp/1e6:6.2f} Mrays/s",
                  flush=True)


if __name__ == "__main__":
    main()
