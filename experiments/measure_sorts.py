#!/usr/bin/env python
"""Sort-key shootout for incoherent (bounce/ao) rays on the packet kernel.

The octant+origin-Morton key gives ~2000 pops per 2048-ray tile on
bounce rays (the union is the whole tree). Candidate keys add direction
bits so a tile is a narrow cone from a compact origin region.
"""
import sys
sys.path.insert(0, "/root/repo")
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=260_000)
    ap.add_argument("--rows", default="8,16,32")
    ap.add_argument("--dist", default="bounces",
                    choices=["bounces", "ao"])
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from rodent_tpu.accel import build_bvh
    from rodent_tpu.traversal.api import bvh_to_device, make_rays
    from rodent_tpu.traversal import pallas_packet as pp
    from rodent_tpu.traversal.sorting import _morton10, ray_octant
    from rodent_tpu.utils.testscenes import (hall_primary_rays, make_hall,
                                             hall_secondary_rays)

    verts, idx = make_hall(args.tris)
    bvh = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
    dev = bvh_to_device(bvh)
    lo, hi = verts.min(0), verts.max(0)

    org, dirs = hall_primary_rays(1024, 1024)
    n = len(org)
    prim = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                     jnp.zeros(n, jnp.float32),
                     jnp.full(n, 3.402823466e38, jnp.float32))
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

    def qmorton(p, lo_, hi_, bits):
        q = []
        for i in range(3):
            tq = (p[:, i] - lo_[i]) / max(hi_[i] - lo_[i], 1e-30)
            q.append(jnp.clip(jnp.asarray(tq) * 1024.0, 0,
                              1023).astype(jnp.uint32))
        m = (_morton10(q[0]) | (_morton10(q[1]) << 1)
             | (_morton10(q[2]) << 2))
        return (m >> (30 - bits)) & jnp.uint32((1 << bits) - 1)

    def key_fn(name, o, d):
        oct_ = ray_octant(jnp.asarray(d)).astype(jnp.uint32)
        om = qmorton(o, lo, hi, 30)
        dm = qmorton(d, np.array([-1.0, -1, -1]), np.array([1.0, 1, 1]), 30)
        if name == "oct+org":           # round-1 production key
            return (oct_ << 28) | (om >> 2)
        if name == "oct+dir6+org":
            return (oct_ << 28) | ((dm >> 24) << 22) | (om >> 8)
        if name == "oct+dir9+org":
            return (oct_ << 28) | ((dm >> 21) << 19) | (om >> 11)
        if name == "oct+dir12+org":
            return (oct_ << 28) | ((dm >> 18) << 16) | (om >> 14)
        if name == "org9+oct+dir":
            return ((om >> 21) << 22) | (oct_ << 19) | (dm >> 11)
        if name == "org12+oct+dir":
            return ((om >> 18) << 19) | (oct_ << 16) | (dm >> 14)
        if name == "org15+oct+dir":
            return ((om >> 15) << 16) | (oct_ << 13) | (dm >> 17)
        if name == "oct+org15+dir":    # production ray_sort_keys form
            return (oct_ << 29) | ((om >> 15) << 14) | (dm >> 16)
        if name == "org18+oct":
            return ((om >> 12) << 3) | oct_
        raise ValueError(name)

    rows_list = [int(r) for r in args.rows.split(",")]
    kind = args.dist
    any_hit = kind == "ao"
    o2, d2, tmax2 = hall_secondary_rays(kind, hp, fnrm)
    base = make_rays(jnp.asarray(o2), jnp.asarray(d2),
                     jnp.full(n, 1e-3, jnp.float32), jnp.asarray(tmax2))

    keys = ["oct+org15+dir", "oct+org", "oct+dir9+org",
            "org9+oct+dir", "org12+oct+dir", "org15+oct+dir", "org18+oct"]
    print(f"{'key':>14} {'rows':>5} {'Mrays/s':>8} {'pops/tile':>10} {'max':>7}")
    for kname in keys:
        kv = key_fn(kname, o2, d2)
        perm = jnp.argsort(kv)
        rays = {k: v[perm] for k, v in base.items()}
        for rows in rows_list:
            fn = jax.jit(lambda r, tr=rows: pp.traverse_packet(
                dev, r, any_hit=any_hit, tile_rows=tr))
            out = fn(rays)
            jax.block_until_ready(out["t"])
            iters = 3
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(rays)
            jax.block_until_ready(out["t"])
            dt = (time.perf_counter() - t0) / iters
            mrays = n / dt / 1e6

            packed, nt = pp.pack_rays(rays, rows)
            outs = pp._call_kernel(dev, packed, nt, rows, False,
                                   False, count_pops=True)
            cnt = np.asarray(outs[5])[::8, 0]
            print(f"{kname:>14} {rows:>5} {mrays:>8.1f} {cnt.mean():>10.0f} "
                  f"{cnt.max():>7d}")


if __name__ == "__main__":
    main()
