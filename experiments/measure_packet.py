#!/usr/bin/env python
"""Packet-kernel profiling: pops/tile + ns/pop per distribution.

Decides whether the shared-stack kernel is bound by the per-pop serial
scalar chain or by VPU vector work, and measures what the packet kernel
actually does on the realistic ao/bounces distributions (bench.py routes
those to the XLA dual-queue path on a round-1 measurement made with
fully-random bbox rays, not these).

Usage: python experiments/measure_packet.py [--tris 260000] [--rows 8,16,32,64]
"""
import sys
sys.path.insert(0, "/root/repo")
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=260_000)
    ap.add_argument("--rows", default="16,32,64,96")
    ap.add_argument("--multi", default="2",
                    help="interleaved tiles per grid step (sweep list)")
    ap.add_argument("--rays", type=int, default=1024 * 1024)
    ap.add_argument("--frustum", action="store_true")
    ap.add_argument("--dists", default="primary,ao,bounces")
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
                                             hall_secondary_rays)

    verts, idx = make_hall(args.tris)
    bvh = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
    dev = bvh_to_device(bvh)
    print(f"nodes={bvh.num_nodes} packets={bvh.num_packets} "
          f"backend={jax.default_backend()}")

    side = int(np.sqrt(args.rays))
    org, dirs = hall_primary_rays(side, side)
    n = len(org)
    prim = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                     jnp.zeros(n, jnp.float32),
                     jnp.full(n, 3.402823466e38, jnp.float32))
    prim_s, _ = sort_rays(prim, verts.min(0), verts.max(0))

    # secondary rays from unsorted primary hits
    hit_un = pp.traverse_packet(dev, prim)
    t = np.asarray(hit_un["t"])
    pid = np.asarray(hit_un["prim_id"])
    t = np.where(pid >= 0, t, 1.0)
    hp = org + dirs * t[:, None]
    i4 = idx.reshape(-1, 4)
    tri = np.maximum(pid, 0)
    v0, v1, v2 = verts[i4[tri, 0]], verts[i4[tri, 1]], verts[i4[tri, 2]]
    fnrm = np.cross(v0 - v1, v2 - v0)
    fnrm = np.where((fnrm * dirs).sum(1, keepdims=True) > 0, -fnrm, fnrm)

    # dists run in the order given on the CLI so a timeout-truncated
    # sweep still prints the highest-value rows first
    dists = {}
    for kind in args.dists.split(","):
        if kind == "primary":
            dists["primary"] = (prim_s, False)
            continue
        any_hit = kind == "ao"
        o2, d2, tmax2 = hall_secondary_rays(kind, hp, fnrm)
        rays2 = make_rays(jnp.asarray(o2), jnp.asarray(d2),
                          jnp.full(n, 1e-3, jnp.float32),
                          jnp.asarray(tmax2))
        rays2, _ = sort_rays(rays2, verts.min(0), verts.max(0))
        dists[kind] = (rays2, any_hit)

    rows_list = [int(r) for r in args.rows.split(",")]
    multi_list = [int(mm) for mm in args.multi.split(",")]
    if args.frustum and multi_list != [1]:
        # frustum lives in the single-tile body only; _call_kernel would
        # demote every multi>1 row to 1 and the multi column would lie
        print("# --frustum forces multi=1 (single-tile body only)")
        multi_list = [1]
    print(f"{'dist':>8} {'rows':>5} {'multi':>5} {'Mrays/s':>8} "
          f"{'pops/tile':>10} {'max':>6} {'ns/pop':>8} "
          f"{'pops/ray-equiv':>14}")
    for name, (rays, any_hit) in dists.items():
        for rows in rows_list:
          for mw in multi_list:
            try:
                fn = jax.jit(lambda r, ah=any_hit, tr=rows, mm=mw:
                             pp.traverse_packet(dev, r, any_hit=ah,
                                                tile_rows=tr, multi=mm,
                                                frustum=args.frustum))
                out = fn(rays)
                jax.block_until_ready(out["t"])
            except Exception as e:  # narrow tiles may not lower
                print(f"{name:>8} {rows:>5} {mw:>5} FAILED "
                      f"({type(e).__name__}: {str(e)[:80]})", flush=True)
                continue
            iters = 3
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(rays)
            jax.block_until_ready(out["t"])
            dt = (time.perf_counter() - t0) / iters
            mrays = n / dt / 1e6

            # counted pass (separate compile, single-tile body — the
            # counter is per-tile SMEM; timing not reused)
            tile = rows * 128
            packed, nt = pp.pack_rays(rays, rows)
            outs = pp._call_kernel(dev, packed, nt, rows, any_hit,
                                   False, count_pops=True, multi=1,
                                   frustum=args.frustum)
            cnt = np.asarray(outs[5])[::8, 0]
            total_pops = int(cnt.sum())
            ns_pop = dt / total_pops * 1e9
            print(f"{name:>8} {rows:>5} {mw:>5} {mrays:>8.1f} "
                  f"{cnt.mean():>10.0f} {cnt.max():>6d} {ns_pop:>8.0f} "
                  f"{total_pops * tile / n:>14.0f}")


if __name__ == "__main__":
    main()
