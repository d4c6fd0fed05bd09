"""Benchmark sweep: scene x distribution x kernel-variant table.

The reference's benchmarks/benchmark.py drives bench_traversal over
{sponza, crown, san-miguel, powerplant} x {primary, ao, bounces} x six
SIMD/BVH-width variants and prints `scene : rays : variant : embree :
rodent` lines (benchmark.py:38-52). This is the TPU analog: procedural
stand-in scenes (utils.testscenes — the reference meshes are not
redistributable), the same three ray distributions generated the same
way (primary pinhole; ao = short any-hit, bounces = cosine-hemisphere
from primary hits — tools/ray_gen roles), and the kernel variants that
exist here:

  pair    pair-layout Pallas kernel (v3, traversal.pallas_pair)
  packet  shared-stack Pallas kernel (v2, traversal.pallas_packet)
  tiled   pure-XLA dual-queue lockstep loop (traversal.tiled)

Output format preserved: `scene : rays : variant : Mrays` (one run, no
competitor column — api.intersect_bruteforce plays the Embree oracle
role in the test suite, not in timing).

Usage: python -m rodent_tpu.tools.benchmark [--scenes hall,crown]
       [--dists primary,ao,bounces] [--variants pair,packet,tiled]
       [--tris N] [--rays N] [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def secondary_rays(kind, verts, idx, org, dirs, hit, ao_frac=0.05):
    """ao/bounces distributions from primary hits (tools/ray_gen roles).
    ao tmax scales with the scene diagonal (benchmark.py's per-scene
    ao_max offsets)."""
    from ..utils.testscenes import hall_secondary_rays
    t = np.asarray(hit["t"])
    pid = np.asarray(hit["prim_id"])
    t = np.where(pid >= 0, t, 1.0)
    hp = org + dirs * t[:, None]
    i4 = idx.reshape(-1, 4)
    tri = np.maximum(pid, 0)
    v0, v1, v2 = verts[i4[tri, 0]], verts[i4[tri, 1]], verts[i4[tri, 2]]
    fnrm = np.cross(v0 - v1, v2 - v0)
    fnrm = np.where((fnrm * dirs).sum(1, keepdims=True) > 0, -fnrm, fnrm)
    diag = float(np.linalg.norm(verts.max(0) - verts.min(0)))
    return hall_secondary_rays(kind, hp, fnrm, ao_tmax=diag * ao_frac)


def secondary_sort_key(org, d, lo, hi):
    """Origin-major + octant + direction-Morton key — measured best for
    incoherent distributions on the shared-stack kernels (round-2 sort
    shootout: 2.1 -> 3.0 Mrays/s on hall bounces)."""
    import jax.numpy as jnp
    from ..traversal.sorting import _morton10, ray_octant
    oct_ = ray_octant(jnp.asarray(d)).astype(jnp.uint32)
    q = []
    for i in range(3):
        t = (org[:, i] - lo[i]) / max(hi[i] - lo[i], 1e-30)
        q.append(jnp.clip(jnp.asarray(t) * 1024.0, 0,
                          1023).astype(jnp.uint32))
    om = (_morton10(q[0]) | (_morton10(q[1]) << 1) | (_morton10(q[2]) << 2))
    dq = [jnp.clip((jnp.asarray(d[:, i]) + 1) * 512, 0,
                   1023).astype(jnp.uint32) for i in range(3)]
    dm = (_morton10(dq[0]) | (_morton10(dq[1]) << 1) | (_morton10(dq[2]) << 2))
    return ((om >> 21) << 22) | (oct_ << 19) | (dm >> 11)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="scene x distribution x variant traversal sweep")
    ap.add_argument("--scenes", default="hall,crown,powerplant")
    ap.add_argument("--dists", default="primary,ao,bounces")
    ap.add_argument("--variants", default="pair,packet,tiled")
    ap.add_argument("--tris", type=int, default=260_000)
    ap.add_argument("--rays", type=int, default=1024 * 1024)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ..accel import build_bvh
    from ..traversal.api import bvh_to_device, make_rays
    from ..traversal.pallas_packet import traverse_packet
    from ..traversal.pallas_pair import traverse_pair
    from ..traversal.tiled import traverse_tiled
    from ..traversal.sorting import sort_rays
    from ..utils.testscenes import SCENES

    kernels = {
        "pair": lambda dev, r, ah: traverse_pair(dev, r, any_hit=ah),
        "packet": lambda dev, r, ah: traverse_packet(dev, r, any_hit=ah),
        "tiled": lambda dev, r, ah: traverse_tiled(dev, r, any_hit=ah),
    }
    results = []
    side = int(np.sqrt(args.rays))
    n = side * side
    for scene in args.scenes.split(","):
        mk, prim_fn = SCENES[scene]
        verts, idx = mk(args.tris)
        bvh = build_bvh(verts, idx, arity=8, packet=8)
        dev = bvh_to_device(bvh)
        lo, hi = verts.min(0), verts.max(0)

        org, dirs = prim_fn(side, side)
        prim = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                         jnp.zeros(n, jnp.float32),
                         jnp.full(n, 3.402823466e38, jnp.float32))
        hit_un = kernels["tiled" if "pair" not in args.variants
                         else "pair"](dev, prim, False)
        jax.block_until_ready(hit_un["t"])

        dist_rays = {}
        if "primary" in args.dists:
            dist_rays["primary"] = (sort_rays(prim, lo, hi)[0], False)
        for kind in ("ao", "bounces"):
            if kind not in args.dists:
                continue
            o2, d2, tmax2 = secondary_rays(kind, verts, idx, org, dirs,
                                           hit_un)
            rays2 = make_rays(jnp.asarray(o2), jnp.asarray(d2),
                              jnp.full(n, 1e-3, jnp.float32),
                              jnp.asarray(tmax2))
            perm = jnp.argsort(secondary_sort_key(o2, d2, lo, hi))
            dist_rays[kind] = ({k: v[perm] for k, v in rays2.items()},
                               kind == "ao")

        for dist, (rays, any_hit) in dist_rays.items():
            for vname in args.variants.split(","):
                fn = jax.jit(lambda r, k=kernels[vname], ah=any_hit:
                             k(dev, r, ah))
                out = fn(rays)
                jax.block_until_ready(out["t"])
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = fn(rays)
                jax.block_until_ready(out["t"])
                dt = (time.perf_counter() - t0) / args.iters
                mrays = n / dt / 1e6
                print(f"{scene} : {dist} : {vname} : {mrays:.2f}",
                      flush=True)
                results.append({"scene": scene, "dist": dist,
                                "variant": vname,
                                "mrays": round(mrays, 2)})
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
