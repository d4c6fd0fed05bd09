#!/usr/bin/env python
"""Crown build-variant A/B (round-4 VERDICT item 5, follow-up).

The crown attribution (results_tpu_r4.txt) pinned the deficit on POP
COUNT: 187 pops/tile vs hall's 57 at a LOWER ns/pop, on a tree of depth
43 (vs hall's 7) with occupancy 6.31/8.  The SAH sums say the expected
per-ray pops are comparable (inner+leaf: crown 16.2, hall 18.9) — so the
3.3x pops/tile is the shared-stack UNION diverging down 43 levels of
lopsided subtrees built from the overlapping filigree.

This sweep measures whether builder shape moves it: quality (SBVH
spatial splits vs binned), DP-collapse leaf_cost (lower -> fatter
leaves -> shallower tree -> smaller per-level union), and binary leaf
threshold.  Per variant: tree stats + counted pops/tile + measured
primary Mrays/s (interleaved median of blocks, same harness rules as
ab_primary_config).

The same sweep runs on hall (--scene hall): hall's pops are leaf-light
(chain max 1.00, SAH leaf 4.2 vs inner 14.7), so a fatter-leaf build
attacks the inner-pop count that dominates the primary headline too.

Usage: python experiments/ab_crown_build.py [--scene crown|hall]
       [--tris 0=default] [--rows 32] [--iters 3] [--blocks 3]
"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
import argparse
import time

import numpy as np

from attribute_crown import tree_stats


VARIANTS = [
    # (label, build kwargs)
    ("q1-lt12-lc1.2", dict(quality=1, leaf_threshold=12)),          # base
    ("q1-lt12-lc0.6", dict(quality=1, leaf_threshold=12, leaf_cost=0.6)),
    ("q1-lt12-lc0.3", dict(quality=1, leaf_threshold=12, leaf_cost=0.3)),
    ("q0-lt12-lc1.2", dict(quality=0, leaf_threshold=12)),
    ("q0-lt12-lc0.6", dict(quality=0, leaf_threshold=12, leaf_cost=0.6)),
    ("q1-lt24-lc0.6", dict(quality=1, leaf_threshold=24, leaf_cost=0.6)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="crown",
                    choices=("crown", "hall", "powerplant"))
    ap.add_argument("--tris", type=int, default=0)
    ap.add_argument("--rows", type=int, default=32)
    ap.add_argument("--multi", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--blocks", type=int, default=3)
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

    defaults = {"crown": 800_000, "hall": 260_000, "powerplant": 2_000_000}
    tris = args.tris or defaults[args.scene]
    verts, idx = getattr(testscenes, f"make_{args.scene}")(tris)
    org, dirs = getattr(testscenes, f"{args.scene}_primary_rays")(1024, 1024)
    n = len(org)
    print(f"{args.scene} tris={len(idx)//4} rays={n} rows={args.rows} "
          f"multi={args.multi} blocks={args.blocks}x{args.iters} "
          f"backend={jax.default_backend()}", flush=True)

    builds = []
    for label, kw in VARIANTS:
        t0 = time.perf_counter()
        bvh = build_bvh(verts, idx, arity=8, packet=8, **kw)
        st = tree_stats(bvh, verts)
        print(f"{label}: nodes={bvh.num_nodes} packets={bvh.num_packets} "
              f"build={time.perf_counter() - t0:.0f}s occ="
              f"{st['child_occupancy']:.2f} depth={st['max_depth']} "
              f"chain_max={st['leaf_chain_max']} "
              f"sah_i={st['sah_inner']:.1f} sah_l={st['sah_leaf']:.1f}",
              flush=True)
        builds.append((label, bvh))

    if jax.default_backend() != "tpu":
        return
    rays = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                     jnp.zeros(n, jnp.float32),
                     jnp.full(n, 3.402823466e38, jnp.float32))
    rays, _ = sort_rays(rays, verts.min(0), verts.max(0))

    fns, samples = {}, {}
    for label, bvh in builds:
        dev = bvh_to_device(bvh)
        fn = jax.jit(lambda r, d=dev: pp.traverse_packet(
            d, r, tile_rows=args.rows, multi=args.multi))
        out = fn(rays)
        _ = np.asarray(out["t"][:8])
        # counted pops (single-tile body, multi demoted)
        packed, nt = pp.pack_rays(rays, args.rows)
        outs = pp._call_kernel(dev, packed, nt, args.rows, False,
                               False, count_pops=True, multi=1)
        cnt = np.asarray(outs[5])[::8, 0]
        hitf = float(jnp.mean((out["prim_id"] >= 0).astype(jnp.float32)))
        print(f"{label}: pops/tile mean={cnt.mean():.0f} max={cnt.max()} "
              f"hit={hitf:.3f}", flush=True)
        fns[label] = fn
        samples[label] = []

    # interleaved timed blocks (variant order rotates per block so slow
    # drift hits all variants equally)
    labels = [l for l, _ in builds]
    for b in range(args.blocks):
        for label in labels[b % len(labels):] + labels[:b % len(labels)]:
            fn = fns[label]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(rays)
            _ = np.asarray(out["t"][:8])
            samples[label].append(
                n * args.iters / (time.perf_counter() - t0) / 1e6)
    for label in labels:
        s = sorted(samples[label])
        print(f"{label:>16} {s[len(s) // 2]:6.2f} Mrays/s "
              f"(min {s[0]:.2f} max {s[-1]:.2f})", flush=True)


if __name__ == "__main__":
    main()
