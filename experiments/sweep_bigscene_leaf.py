#!/usr/bin/env python
"""Big-scene leaf-pop attack (VERDICT r4/r5 item 3): sweep the HBM-tier
build parameters on powerplant — leaf_threshold x leaf_cost (the
`leaf_cost` override exists for exactly this, native/bvh_builder.cpp) —
and report counted node/leaf pops plus delivered Mrays/s per build.

At 4.3M tris, 68% of pops are leaf DMAs (results_tpu_r4.txt). Two ways
to cut them: (a) bigger/tighter leaves via the DP collapse's leaf_cost
(each leaf pop in hbm mode pays ~1-2 us DMA, so the collapse should
price leaves >> nodes); (b) Tri16 packets (one 2-line DMA per 16 tris,
--packet 16) halving packet count where leaves have >8 tris.

Usage: python experiments/sweep_bigscene_leaf.py [--tris 5000000]
       [--lts 12,24,32] [--lcs 0,4,8] [--packets 8]
       [--configs 16x2,32x1] [--blocks 3] [--iters 2]
"""
import sys
sys.path.insert(0, "/root/repo")
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=5_000_000)
    ap.add_argument("--lts", default="12,24,32")
    ap.add_argument("--lcs", default="0,4,8")   # 0 = default C_LEAF
    ap.add_argument("--packets", default="8")
    ap.add_argument("--configs", default="16x2,32x1")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--no-count", action="store_true")
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
    ntris = len(idx) // 4
    org, dirs = powerplant_primary_rays(1024, 1024)
    n = len(org)
    rays = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                     jnp.zeros(n, jnp.float32),
                     jnp.full(n, 3.402823466e38, jnp.float32))
    rays, _ = sort_rays(rays, verts.min(0), verts.max(0))
    print(f"tris={ntris} backend={jax.default_backend()}", flush=True)

    configs = []
    for c in args.configs.split(","):
        r, m = (int(x) for x in c.split("x"))
        configs.append((r, m))

    for pk in (int(x) for x in args.packets.split(",")):
        for lt in (int(x) for x in args.lts.split(",")):
            for lc in (float(x) for x in args.lcs.split(",")):
                t0 = time.time()
                bvh = build_bvh(verts, idx, arity=8, packet=pk,
                                quality=0, leaf_threshold=lt,
                                leaf_cost=lc)
                dev = bvh_to_device(bvh)
                hdr = (f"pk={pk} lt={lt} lc={lc or 'def'}: "
                       f"nodes={bvh.num_nodes} packets={bvh.num_packets} "
                       f"tri_mb={bvh.num_packets*14*pk*4/1e6:.0f} "
                       f"build={time.time()-t0:.0f}s")
                if not args.no_count:
                    rowsc = 16
                    tile = rowsc * 128
                    packed, nt = pp.pack_rays(rays, rowsc)
                    outs = pp._call_kernel(dev, packed, nt, rowsc, False,
                                           False, count_pops=True,
                                           multi=1, tris_hbm=True)
                    cnt = np.asarray(outs[5])
                    total = cnt[::8, 0].astype(np.int64)
                    leaf = cnt[1::8, 0].astype(np.int64)
                    hdr += (f" | pops/tile {total.mean():.0f} "
                            f"leaf {leaf.mean():.0f} "
                            f"({leaf.sum()/max(total.sum(),1):.0%}) "
                            f"DMA/ray {leaf.sum()*tile/n:.1f}")
                print(hdr, flush=True)
                for r, m in configs:
                    fn = jax.jit(lambda d, ra, tr=r, mm=m:
                                 pp.traverse_packet(d, ra, tile_rows=tr,
                                                    multi=mm,
                                                    tris_hbm=True,
                                                    prefetch=True))
                    try:
                        out = fn(dev, rays)
                        _ = np.asarray(out["t"][:8])
                    except Exception as e:
                        print(f"  {r}x{m}: FAILED {type(e).__name__}: "
                              f"{e}", flush=True)
                        continue
                    hits = float(jnp.mean(
                        (out["prim_id"] >= 0).astype(jnp.float32)))
                    ss = []
                    for _b in range(args.blocks):
                        t1 = time.perf_counter()
                        for _ in range(args.iters):
                            out = fn(dev, rays)
                        _ = np.asarray(out["t"][:8])
                        ss.append(n * args.iters
                                  / (time.perf_counter() - t1) / 1e6)
                    ss.sort()
                    print(f"  {r}x{m}: {ss[len(ss)//2]:7.2f} Mrays/s "
                          f"(min {ss[0]:.2f} max {ss[-1]:.2f}) "
                          f"hit={hits:.4f}", flush=True)
                del dev, bvh


if __name__ == "__main__":
    main()
