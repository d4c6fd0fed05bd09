#!/usr/bin/env python
"""Attribute the big-scene (tris_hbm) packet kernel's cost (VERDICT r4
item 4: powerplant hbm 14.65 -> >= 25 Mrays/s, or a measured floor).

Decomposition on the powerplant primary workload:
  - node vs LEAF pops per tile (counted pass; each leaf pop in hbm mode
    is one HBM DMA of a (1, 128) Tri8 line);
  - throughput at rows x multi variants, prefetch on/off;
  - the implied ns per leaf-DMA after subtracting the VMEM-kernel pop
    cost model (~600 ns fixed + ~18.6 ns x rows per pop).

Round-4 context: the other named levers are measured dead host-side —
leaf chains are ~1.0 (nothing for a 2-row DMA to fetch) and the
DP-collapse leaf_cost only moves area-weighted packet count ~2.5%
(ROADMAP round-4). What remains is transport: hiding more of the DMA
latency (prefetch) or shrinking the pop count (tile shape).

Usage: python experiments/attribute_bigscene.py [--tris 5000000]
       [--configs 16x2,32x1,32x2] [--iters 2] [--blocks 3]
"""
import sys
sys.path.insert(0, "/root/repo")
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=5_000_000)
    ap.add_argument("--configs", default="16x2,32x1,32x2")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--count-rows", type=int, default=16,
                    help="tile_rows for the counted pass")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from rodent_tpu.accel import build_bvh
    from rodent_tpu.traversal.api import bvh_to_device, make_rays
    from rodent_tpu.traversal import pallas_packet as pp
    from rodent_tpu.traversal.sorting import sort_rays
    from rodent_tpu.utils.testscenes import (make_powerplant,
                                             powerplant_primary_rays)

    verts, idx = make_powerplant(args.tris)
    bvh = build_bvh(verts, idx, arity=8, packet=8, quality=0,
                    leaf_threshold=12)
    dev = bvh_to_device(bvh)
    print(f"tris={len(idx)//4} nodes={bvh.num_nodes} "
          f"packets={bvh.num_packets} "
          f"node_mb={bvh.num_nodes*7*8*4/1e6:.0f} "
          f"tri_mb={bvh.num_packets*14*8*4/1e6:.0f} "
          f"backend={jax.default_backend()}")
    org, dirs = powerplant_primary_rays(1024, 1024)
    n = len(org)
    rays = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                     jnp.zeros(n, jnp.float32),
                     jnp.full(n, 3.402823466e38, jnp.float32))
    rays, _ = sort_rays(rays, verts.min(0), verts.max(0))

    # ---- counted pass: node vs leaf pops (single-tile body, hbm) ----
    rows = args.count_rows
    tile = rows * 128
    packed, nt = pp.pack_rays(rays, rows)
    outs = pp._call_kernel(dev, packed, nt, rows, False, False,
                           count_pops=True, multi=1, tris_hbm=True)
    cnt = np.asarray(outs[5])
    total = cnt[::8, 0].astype(np.int64)
    leaf = cnt[1::8, 0].astype(np.int64)
    print(f"counted (rows={rows}): pops/tile mean={total.mean():.0f} "
          f"max={total.max()} | leaf pops/tile mean={leaf.mean():.0f} "
          f"({leaf.sum()/total.sum():.0%} of pops) | "
          f"leaf DMAs/ray={leaf.sum()*tile/n:.1f}", flush=True)

    # ---- throughput: configs x prefetch, interleaved blocks ----
    variants = []
    for c in args.configs.split(","):
        r, m = (int(x) for x in c.split("x"))
        for pf in (True, False):
            variants.append((r, m, pf))
    # dev passed as an argument, not a closure capture: captured tables
    # become program constants and blow the remote-compile request-body
    # limit at powerplant scale (HTTP 413)
    fns = {}
    for r, m, pf in variants:
        fns[(r, m, pf)] = jax.jit(
            lambda d, ra, tr=r, mm=m, p=pf: pp.traverse_packet(
                d, ra, tile_rows=tr, multi=mm, tris_hbm=True,
                prefetch=p))
        out = fns[(r, m, pf)](dev, rays)
        _ = np.asarray(out["t"][:8])
    samples = {v: [] for v in variants}
    for _b in range(args.blocks):
        for v in variants:
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fns[v](dev, rays)
            _ = np.asarray(out["t"][:8])
            samples[v].append(n * args.iters
                              / (time.perf_counter() - t0) / 1e6)
    for v in variants:
        s = sorted(samples[v])
        r, m, pf = v
        print(f"{r:>3}x{m} pf={'on ' if pf else 'off'} "
              f"{s[len(s) // 2]:>7.2f} Mrays/s "
              f"(min {s[0]:.2f} max {s[-1]:.2f})", flush=True)


if __name__ == "__main__":
    main()
