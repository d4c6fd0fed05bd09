#!/usr/bin/env python
"""Hall-primary packet-size race (round 5): does the big-scene Tri12/
Tri16/Tri24 leaf-pop win transfer to the VMEM-resident headline row?

The carry-top kernel is vector-issue-bound at ~870-960 ns/pop
(results_tpu_r5.txt decomposition); bigger leaf packets trade leaf POPS
(fixed cost each) for MT lanes (scaling cost). On the DMA tier the knee
was pk24 (+40%); here rows load from VMEM (multi-line vector loads, no
DMA), so the knee may sit lower.

Usage: python experiments/race_hall_packet.py [--tris 260000]
       [--packets 8,12,16,24] [--lcs 1.2,0.6] [--blocks 5] [--iters 5]
"""
import sys
sys.path.insert(0, "/root/repo")
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=260_000)
    ap.add_argument("--packets", default="8,12,16,24")
    ap.add_argument("--lcs", default="0,0.6")
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--rows", default="32,24")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from rodent_tpu.accel import build_bvh
    from rodent_tpu.traversal.api import bvh_to_device, make_rays
    from rodent_tpu.traversal import pallas_packet as pp
    from rodent_tpu.traversal.sorting import sort_rays
    from rodent_tpu.utils.testscenes import make_hall, hall_primary_rays

    verts, idx = make_hall(args.tris)
    org, dirs = hall_primary_rays(1024, 1024)
    n = len(org)
    rays = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                     jnp.zeros(n, jnp.float32),
                     jnp.full(n, 3.402823466e38, jnp.float32))
    rays, _ = sort_rays(rays, verts.min(0), verts.max(0))
    print(f"tris={len(idx)//4} backend={jax.default_backend()}",
          flush=True)

    for pk in (int(x) for x in args.packets.split(",")):
        for lc in (float(x) for x in args.lcs.split(",")):
            bvh = build_bvh(verts, idx, arity=8, packet=pk,
                            leaf_threshold=12, leaf_cost=lc)
            dev = bvh_to_device(bvh)
            vm_mb = (dev["nodes"].size + dev["tris"].size) * 4 / 1e6
            print(f"pk={pk} lc={lc or 'def'}: nodes={bvh.num_nodes} "
                  f"packets={bvh.num_packets} vmem={vm_mb:.0f}MB",
                  flush=True)
            if vm_mb > 100:
                print("  skipped (tables exceed VMEM)", flush=True)
                continue
            for rows in (int(x) for x in args.rows.split(",")):
                fn = jax.jit(lambda d, r, rr=rows: pp.traverse_packet(
                    d, r, tile_rows=rr, multi=1, carry_top=True))
                try:
                    out = fn(dev, rays)
                    _ = np.asarray(out["t"][:8])
                except Exception as e:
                    print(f"  ct-{rows}x1: FAILED {type(e).__name__}",
                          flush=True)
                    continue
                ss = []
                for _b in range(args.blocks):
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        out = fn(dev, rays)
                    _ = np.asarray(out["t"][:8])
                    ss.append(n * args.iters
                              / (time.perf_counter() - t0) / 1e6)
                ss.sort()
                hits = float(jnp.mean(
                    (out["prim_id"] >= 0).astype(jnp.float32)))
                print(f"  ct-{rows}x1: {ss[len(ss)//2]:7.2f} Mrays/s "
                      f"(min {ss[0]:.2f} max {ss[-1]:.2f}) "
                      f"hit={hits:.4f}", flush=True)
            del dev, bvh


if __name__ == "__main__":
    main()
