#!/usr/bin/env python
"""Attribute crown's primary-ray deficit (round-4 VERDICT item 5).

crown-800K measured 26.5 Mrays/s primary vs hall-260K's 61 on 3x the
triangles (reference CPU: crown 104 vs sponza 38 — the INVERSE). This
script separates the suspects with host-side tree statistics plus
on-device counted passes:

  1. BVH quality on the spiky procedural geometry: leaf lane fill,
     packets/tri, per-node child occupancy, SAH surface-area cost, tree
     depth (the reference prints the same behind #ifdef STATISTICS,
     src/driver/bvh.h:109-111).
  2. Work per tile: pops/tile (counted pass) on crown vs hall primary —
     is the kernel doing more pops, or the same pops more slowly?
  3. Table scale: node/tri table MB (VMEM residency), ns/pop.

Usage: python experiments/attribute_crown.py [--scenes hall,crown]
       [--rows 32] [--multi 1]
"""
import sys
sys.path.insert(0, "/root/repo")
import argparse
import time

import numpy as np


def tree_stats(bvh, verts):
    child = bvh.child              # (N, A)
    bounds = bvh.bounds            # (N, 6, A)
    stats = {}
    occ = (child != 0).sum(1)
    stats["child_occupancy"] = float(occ.mean())
    # lane fill counts a sign-bit-flagged (last-packet) lane as valid;
    # only the -1 padding sentinel is empty
    valid = bvh.prim_id != -1
    stats["lane_fill"] = float(valid.mean())
    stats["packets_per_tri"] = bvh.num_packets * bvh.packet / max(
        1, int(valid.sum()))
    # SAH cost: sum over child slots of half-area(slot) weighted 1 for
    # inner, ceil-chain for leaves, normalized by the root's half-area
    w = bounds[:, 1::2, :] - bounds[:, 0::2, :]   # (N, 3, A)
    w = np.maximum(w, 0.0)
    ha = (w[:, 0] * w[:, 1] + w[:, 1] * w[:, 2]
          + w[:, 2] * w[:, 0])                    # (N, A)
    lo, hi = verts.min(0), verts.max(0)
    ext = hi - lo
    root_ha = ext[0] * ext[1] + ext[1] * ext[2] + ext[2] * ext[0]
    inner = child > 0
    leaf = child < 0
    stats["sah_inner"] = float(ha[inner].sum() / root_ha)
    # leaf chain lengths: walk each leaf ref's consecutive packets
    pid_last = bvh.prim_id[:, -1] < 0             # last-packet flag
    first = child[leaf]
    chain = np.zeros(len(first), np.int64)
    code = (~first).astype(np.int64)
    done = np.zeros(len(first), bool)
    for _ in range(64):
        if done.all():
            break
        chain = np.where(done, chain, chain + 1)
        done |= pid_last[np.clip(code, 0, bvh.num_packets - 1)]
        code += 1
    stats["leaf_chain_mean"] = float(chain.mean())
    stats["leaf_chain_max"] = int(chain.max())
    stats["sah_leaf"] = float((ha[leaf] * chain).sum() / root_ha)
    # depth
    depth = np.zeros(bvh.num_nodes, np.int32)
    order = [0]
    for n in order:
        for c in child[n]:
            if c > 0:
                depth[c - 1] = depth[n] + 1
                order.append(c - 1)
    stats["max_depth"] = int(depth.max())
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="hall,crown")
    ap.add_argument("--rows", type=int, default=32)
    ap.add_argument("--multi", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
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

    cfg = {"hall": ("make_hall", "hall_primary_rays", 260_000),
           "crown": ("make_crown", "crown_primary_rays", 800_000),
           "powerplant": ("make_powerplant", "powerplant_primary_rays",
                          2_000_000)}
    for name in args.scenes.split(","):
        mk, rg, tris = cfg[name]
        verts, idx = getattr(testscenes, mk)(tris)
        bvh = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
        st = tree_stats(bvh, verts)
        node_mb = bvh.num_nodes * 7 * bvh.arity * 4 / 1e6
        tri_mb = bvh.num_packets * 14 * bvh.packet * 4 / 1e6
        print(f"{name}: tris={len(idx)//4} nodes={bvh.num_nodes} "
              f"packets={bvh.num_packets} node_mb={node_mb:.1f} "
              f"tri_mb={tri_mb:.1f}")
        print(f"  occupancy={st['child_occupancy']:.2f}/8 "
              f"lane_fill={st['lane_fill']:.2f} "
              f"packets/tri={st['packets_per_tri']:.2f} "
              f"leaf_chain mean={st['leaf_chain_mean']:.2f} "
              f"max={st['leaf_chain_max']} depth={st['max_depth']}")
        print(f"  SAH/root_area: inner={st['sah_inner']:.1f} "
              f"leaf={st['sah_leaf']:.1f}")

        if jax.default_backend() != "tpu":
            continue
        dev = bvh_to_device(bvh)
        org, dirs = getattr(testscenes, rg)(1024, 1024)
        n = len(org)
        rays = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                         jnp.zeros(n, jnp.float32),
                         jnp.full(n, 3.402823466e38, jnp.float32))
        rays, _ = sort_rays(rays, verts.min(0), verts.max(0))
        fn = jax.jit(lambda r: pp.traverse_packet(
            dev, r, tile_rows=args.rows, multi=args.multi))
        out = fn(rays)
        _ = np.asarray(out["t"][:8])
        hitf = float(jnp.mean((out["prim_id"] >= 0).astype(jnp.float32)))
        ts = []
        for _b in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(rays)
            _ = np.asarray(out["t"][:8])
            ts.append(n * args.iters / (time.perf_counter() - t0) / 1e6)
        ts.sort()
        # counted pass (single-tile body)
        packed, nt = pp.pack_rays(rays, args.rows)
        outs = pp._call_kernel(dev, packed, nt, args.rows, False,
                               False, count_pops=True, multi=1)
        cnt = np.asarray(outs[5])[::8, 0]
        total_pops = int(cnt.sum())
        dt = n / (ts[1] * 1e6)
        print(f"  primary {ts[1]:.1f} Mrays/s (min {ts[0]:.1f} max "
              f"{ts[-1]:.1f}) hit={hitf:.3f} pops/tile mean="
              f"{cnt.mean():.0f} max={cnt.max()} "
              f"ns/pop={dt / total_pops * 1e9:.0f}", flush=True)


if __name__ == "__main__":
    main()
