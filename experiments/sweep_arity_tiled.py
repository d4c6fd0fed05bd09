#!/usr/bin/env python
"""Tree arity x Tri-packet sweep for the dual-queue tiled engine's
incoherent rows (the round-5 select-chain attack, results_tpu_r5.txt
waterfall: push+pop one-hot scans are 52-64% of trip time).

Every per-trip cost component of tiled.py scales with ARITY or the
Tri-packet width M, none of which were ever swept for this engine:
  - node push chain: S_N x arity one-hot writes
  - leaf push chain: S_L x arity one-hot writes
  - node unit: arity slab tests + the arity-key Batcher network
    (19 comparators at 8, 5 at 4, 1 at 2)
  - leaf unit: M MT lanes per gathered Tri row
  - S_N itself (compute_stack_needs shrinks with fewer pushes/node)
The price is more trips (deeper trees, more leaf pops). Mean lockstep
utilization is 0.31-0.43, so per-trip savings land ~linearly while the
trip increase is sublinear in arity (divergent rows pay the tile MAX
trip count, and max-trips grows slower than per-ray pops).

Grid: arity in {2,4,8} x packet in {4,8} on the EXACT bench.py
ao/bounces config (hall-260K, 1M secondary rays from the primary
trace, cone-sorted, tiled-c5, sync-fetch timing, median of blocks).

Usage: python experiments/sweep_arity_tiled.py [--tris 260000]
       [--blocks 5] [--iters 2] [--grid 8x8,4x8,4x4,2x4]
"""
import sys
sys.path.insert(0, "/root/repo")
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=260_000)
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--grid", default="8x8,8x4,4x8,4x4,2x8,2x4",
                    help="arityxpacket pairs")
    ap.add_argument("--compact", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:  # this jaxlib ignores JAX_PLATFORMS; config works
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from rodent_tpu.accel import build_bvh
    from rodent_tpu.traversal.api import (bvh_to_device, make_rays,
                                          compute_stack_needs)
    from rodent_tpu.traversal.pallas_packet import traverse_packet
    from rodent_tpu.traversal.tiled import traverse_tiled
    from rodent_tpu.traversal.sorting import sort_rays
    from rodent_tpu.utils.compile import rjit
    from rodent_tpu.utils.testscenes import (make_hall,
                                             hall_primary_rays,
                                             secondary_rays_from_trace)

    verts, idx = make_hall(args.tris)
    lo, hi = verts.min(0), verts.max(0)
    side = 1024
    n = side * side
    org, dirs = hall_primary_rays(side, side)
    prim = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                     jnp.zeros(n, jnp.float32),
                     jnp.full(n, 3.402823466e38, jnp.float32))

    # primary hit points for the secondary distributions come from the
    # production pk8 build (bench.py does the same) so every grid cell
    # traces the SAME ray set
    bvh0 = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
    dev0 = bvh_to_device(bvh0)
    hit0 = traverse_packet(dev0, prim)
    t0 = np.asarray(hit0["t"])
    pid0 = np.asarray(hit0["prim_id"])
    print(f"hall tris={len(idx)//4} backend={jax.default_backend()} "
          f"rays={n}", flush=True)

    dists = {}
    for kind in ("ao", "bounces"):
        o2, d2, tmin2, tmax2 = secondary_rays_from_trace(
            kind, org, dirs, t0, pid0, verts, idx.reshape(-1, 4))
        rays2 = make_rays(jnp.asarray(o2), jnp.asarray(d2),
                          jnp.asarray(tmin2), jnp.asarray(tmax2))
        rays2, _ = sort_rays(rays2, lo, hi)
        dists[kind] = (rays2, kind == "ao")

    ref_frac = {}
    for tok in args.grid.split(","):
        a, p = (int(x) for x in tok.split("x"))
        bvh = build_bvh(verts, idx, arity=a, packet=p, leaf_threshold=12)
        dev = bvh_to_device(bvh)
        s_need, n_need = compute_stack_needs(bvh.child)
        print(f"[a{a} pk{p}] nodes={bvh.num_nodes} "
              f"packets={bvh.num_packets} S_N={n_need} S_sh={s_need}",
              flush=True)
        for kind, (rays2, ah) in dists.items():
            fn = rjit(lambda r, d=dev, ah=ah: traverse_tiled(
                d, r, any_hit=ah, compact_stages=args.compact))
            try:
                out = fn(rays2)
                frac = float(jnp.mean(
                    (out["prim_id"] >= 0).astype(jnp.float32)))
            except Exception as e:
                print(f"  {kind}: FAILED {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)
                continue
            # sanity: hit fraction must match the arity-8 reference cell
            # (different trees may tie-break differently on exact-equal
            # t, so ids are checked statistically, not elementwise)
            if kind not in ref_frac:
                ref_frac[kind] = frac
            dev_frac = abs(frac - ref_frac[kind])
            meds = []
            for _ in range(args.blocks):
                tt = time.perf_counter()
                for _ in range(args.iters):
                    out = fn(rays2)
                    _ = np.asarray(out["t"][:64])  # honest sync fetch
                meds.append(n * args.iters
                            / (time.perf_counter() - tt) / 1e6)
            meds = np.sort(np.asarray(meds))
            print(f"  {kind} a{a}pk{p}: {meds[len(meds)//2]:6.2f} Mrays/s"
                  f" [{meds[0]:.2f}, {meds[-1]:.2f}] "
                  f"hitfrac={frac:.4f} (dfrac={dev_frac:.4f})",
                  flush=True)


if __name__ == "__main__":
    main()
