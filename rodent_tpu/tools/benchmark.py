"""benchmark: the multi-config sweep harness (benchmarks/benchmark.py role).

The reference's harness runs bench_traversal over scene x ray-distribution
x kernel-variant and prints one line per config in the format
`scene : distribution : variant : Mrays` (reference:
/root/reference/benchmarks/benchmark.py:28-52, results_par.txt). This tool
reproduces that sweep on the TPU build's procedural scene fixtures
(sponza-class hall, crown-class, powerplant-class — the real meshes are
not redistributable) and both traversal engines:

  packet  Pallas shared-stack packet kernel (VMEM-resident BVH)
  hbm     packet kernel, big-scene mode (nodes VMEM, Tri rows DMA'd
          from HBM) — San-Miguel-class scenes
  tiled   XLA dual-queue lockstep kernel (HBM path, any scene size)

--mode renderer runs the full path tracer on the same scenes instead
(compile_mesh supplies materials + an area light) at the reference's
benchmark config 1920x1088 / spp 4 / max-path-len 20
(/root/reference/benchmarks/bench.sh:60-85) and prints Msamples/s rows.

Usage:
  python -m rodent_tpu.tools.benchmark [--scenes hall,crown,powerplant]
      [--dists primary,ao,bounces] [--variants packet,tiled]
      [--rays 1048576] [--iters 3] [--sizes hall=260000,...]
      [--mode traversal|renderer]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

_SCENES = {
    "hall": ("make_hall", "hall_primary_rays", 260_000),
    # mathall: hall geometry with the full-MTL bench materials (textured
    # kd + phong + mix + glass + mirror columns, mat_hall_materials) —
    # the reference's bench interiors are full-MTL (bench.sh:9-85,
    # converter.cpp:859-927); the plain scenes are palette-diffuse only
    "mathall": ("make_hall", "hall_primary_rays", 260_000),
    "crown": ("make_crown", "crown_primary_rays", 800_000),
    "powerplant": ("make_powerplant", "powerplant_primary_rays",
                   2_000_000),
}


def main(argv=None):
    p = argparse.ArgumentParser(prog="benchmark")
    p.add_argument("--scenes", default="hall,crown,powerplant")
    p.add_argument("--dists", default="primary,ao,bounces")
    p.add_argument("--variants", default="packet,hbm,tiled")
    p.add_argument("--rays", type=int, default=1024 * 1024)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--sizes", default="",
                   help="override scene sizes: hall=100000,crown=500000")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--mode", choices=("traversal", "renderer"),
                   default="traversal")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1088)
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--mpl", type=int, default=20,
                   help="max path length (reference bench.sh uses 20)")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ..accel import build_bvh
    from ..traversal.api import bvh_to_device, make_rays
    from ..traversal.pallas_packet import traverse_packet
    from ..traversal.tiled import traverse_tiled
    from ..traversal.sorting import sort_rays
    from ..utils import testscenes
    from ..utils.compile import rjit
    from ..utils.testscenes import hall_secondary_rays

    sizes = {}
    for tok in args.sizes.split(","):
        if "=" in tok:
            k, v = tok.split("=")
            sizes[k] = int(v)

    if args.mode == "renderer":
        return _renderer_sweep(args, sizes)

    side = int(np.sqrt(args.rays))
    n = side * side
    variants = args.variants.split(",")
    # cfg carries the measured per-distribution packet tile config
    # (round-4 rows x multi sweeps, results_tpu_r4.txt: primary 32x1;
    # ao/bounces keep the 16x2 module default). The XLA tiled variants
    # have no tile config and ignore it.
    engines = {
        "packet": lambda dev, r, ah, cfg: traverse_packet(
            dev, r, any_hit=ah, **cfg),
        "hbm": lambda dev, r, ah, cfg: traverse_packet(
            dev, r, any_hit=ah, tris_hbm=True, **cfg),
        "tiled": lambda dev, r, ah, cfg: traverse_tiled(dev, r,
                                                        any_hit=ah),
        # staged row compaction (tiled.py compact_stages): pays when the
        # cone sort makes rows die together
        "tiled-c": lambda dev, r, ah, cfg: traverse_tiled(
            dev, r, any_hit=ah, compact_stages=5),
        # giga-scene mode: node AND Tri tables in HBM, one DMA per pop
        # (>12M-tri scenes whose node table exceeds VMEM)
        "giga": lambda dev, r, ah, cfg: traverse_packet(
            dev, r, any_hit=ah, tris_hbm=True, nodes_hbm=True, **cfg),
        # A/B rows: HBM modes with the exact next-pop DMA prefetch
        # disabled (blocking start();wait() per pop, the round-2
        # transport)
        "hbm-nopf": lambda dev, r, ah, cfg: traverse_packet(
            dev, r, any_hit=ah, tris_hbm=True, prefetch=False, **cfg),
        "giga-nopf": lambda dev, r, ah, cfg: traverse_packet(
            dev, r, any_hit=ah, tris_hbm=True, nodes_hbm=True,
            prefetch=False, **cfg),
    }
    # VMEM budget gates (bytes of f32 tables) for the Pallas variants
    VMEM_BUDGET = 80 * 1024 * 1024

    for scene in args.scenes.split(","):
        make_name, rays_name, dflt = _SCENES[scene]
        tris = sizes.get(scene, dflt)
        verts, idx = getattr(testscenes, make_name)(tris)
        if scene == "powerplant":
            # HBM-tier build (round 5): Tri24 multi-line leaf packets +
            # cheap DP leaves halve the leaf DMAs that are 68% of this
            # scene's pops (sweep_bigscene_leaf.py, results_tpu_r5.txt:
            # 7.67 -> 10.70 Mrays/s at 4.3M tris, knee at pk24);
            # quality=0 keeps the 12.7M-tri build tractable
            bvh = build_bvh(verts, idx, arity=8, packet=24, quality=0,
                            leaf_threshold=12, leaf_cost=0.45)
        else:
            bvh = build_bvh(verts, idx, arity=8, packet=8,
                            leaf_threshold=12)
        dev = bvh_to_device(bvh)
        lo, hi = verts.min(0), verts.max(0)
        org, dirs = getattr(testscenes, rays_name)(side, side)
        prim = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                         jnp.zeros(n, jnp.float32),
                         jnp.full(n, 3.402823466e38, jnp.float32))

        # hit points for the secondary distributions (ray_gen role)
        hit = traverse_tiled(dev, prim)
        t = np.asarray(hit["t"])
        pid = np.asarray(hit["prim_id"])
        t = np.where(pid >= 0, t, 1.0)
        hp = org + dirs * t[:, None]
        i4 = idx.reshape(-1, 4)
        tri = np.maximum(pid, 0)
        v0, v1, v2 = (verts[i4[tri, 0]], verts[i4[tri, 1]],
                      verts[i4[tri, 2]])
        fn = np.cross(v0 - v1, v2 - v0)
        fn = np.where((fn * dirs).sum(1, keepdims=True) > 0, -fn, fn)

        dists = {}
        if "primary" in args.dists:
            dists["primary"] = (prim, False)
        for kind, ah in (("ao", True), ("bounces", False)):
            if kind not in args.dists:
                continue
            o2, d2, tmax2 = hall_secondary_rays(kind, hp, fn)
            dists[kind] = (make_rays(jnp.asarray(o2), jnp.asarray(d2),
                                     jnp.full(n, 1e-3, jnp.float32),
                                     jnp.asarray(tmax2)), ah)

        nodes_b = dev["nodes"].size * 4
        tris_b = dev["tris"].size * 4
        for dist, (rays, ah) in dists.items():
            srt, _ = sort_rays(rays, lo, hi)
            # measured per-scene primary config (r5 probe_crown_sort grid
            # + bigscene sweep, results_tpu_r5.txt): hall-class wins at
            # ct-32x1 (71.2 vs legacy-32x1 67.0); crown-class wins at the
            # 16x2 module default (27.7 vs 32x1 25.5, ct-32x1 16.7 —
            # carry-top's single pop chain amplifies tile-union
            # expansion); the powerplant HBM tier wins at 16x2 (every
            # other tile shape lost the pk-lc sweep).
            pcfg = {}
            if dist == "primary" and scene == "hall":
                pcfg = {"tile_rows": 32, "multi": 1, "carry_top": True}
            for variant in variants:
                if variant == "packet" and nodes_b + tris_b > VMEM_BUDGET:
                    print(f"{scene} : {dist} : packet : skipped "
                          f"(BVH {nodes_b + tris_b >> 20} MB > VMEM; "
                          f"use hbm)", flush=True)
                    continue
                if (variant in ("hbm", "hbm-nopf")
                        and nodes_b > VMEM_BUDGET):
                    print(f"{scene} : {dist} : {variant} : skipped "
                          f"(nodes {nodes_b >> 20} MB > VMEM)", flush=True)
                    continue
                # dev rides as a jit ARGUMENT (closure capture bakes the
                # tables into the HLO as constants; huge scenes overflow
                # the remote-compile request) and timing forces a small
                # host fetch (block_until_ready returns early on some
                # remote-backend programs)
                fn_t = rjit(lambda d, r, e=engines[variant], a=ah,
                            c=pcfg: e(d, r, a, c))
                try:
                    out = fn_t(dev, srt)
                    _ = np.asarray(out["t"][:128])
                except Exception as e:  # keep the unattended sweep alive
                    print(f"{scene} : {dist} : {variant} : FAILED "
                          f"({type(e).__name__}: {str(e)[:120]})",
                          flush=True)
                    continue
                # avg/median/min like the reference harness
                # (bench_traversal.cpp:336-391); the ±8% band on the
                # tunneled chip (ROADMAP) makes single numbers
                # meaningless. Each SAMPLE pipelines `group` calls and
                # forces one small host fetch at the end — a per-call
                # fetch costs ~30 ms through the tunnel and buries
                # 15-20 ms kernels (measured round 3).
                group = 3
                times = []
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    for _g in range(group):
                        out = fn_t(dev, srt)
                    _ = np.asarray(out["t"][:128])
                    times.append((time.perf_counter() - t0) / group)
                times = np.asarray(times)
                mr = n / times / 1e6
                hits = int(np.asarray(
                    (out["prim_id"] >= 0)).sum())
                print(f"{scene} : {dist} : {variant} : "
                      f"{np.median(mr):.2f} Mrays "
                      f"(avg {mr.mean():.2f}, min {mr.min():.2f}, "
                      f"max {mr.max():.2f}, n={args.iters}; "
                      f"{hits} intersections)", flush=True)


# camera + emitter placement per scene (matches the *_primary_rays
# viewpoints in utils.testscenes)
_RENDER_CAMS = {
    "hall": ((2.5, 5.0, 5.0), (1.0, -0.12, 0.02), 60.0, "inside"),
    "mathall": ((2.5, 5.0, 5.0), (1.0, -0.12, 0.02), 60.0, "inside"),
    "crown": ((4.2, 1.8, 1.2), (-4.2, -1.4, -1.2), 42.0, "above"),
    "powerplant": ((-30.0, 60.0, -30.0), (130.0, -40.0, 130.0), 55.0,
                   "above"),
}


def _renderer_sweep(args, sizes):
    """Full path-tracer throughput on the benchmark scenes (the
    reference's bench.sh renderer rows)."""
    W, H, spp = args.width, args.height, args.spp
    for scene_name in args.scenes.split(","):
        try:
            _render_one(args, sizes, scene_name, W, H, spp)
        except Exception as e:  # keep the unattended sweep alive
            print(f"{scene_name} : render : FAILED "
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)


def _render_one(args, sizes, scene_name, W, H, spp):
    import time

    import jax
    import numpy as np

    from ..render import film as film_mod
    from ..render.camera import Camera
    from ..render.compiler import compile_mesh, select_render_policy
    from ..render.integrator import render_iteration_persistent
    from ..utils import testscenes

    make_name, _rays, dflt = _SCENES[scene_name]
    tris = sizes.get(scene_name, dflt)
    eye, dirv, fov, emitter = _RENDER_CAMS[scene_name]
    if scene_name == "mathall":
        verts, idx = testscenes.make_hall(tris, rich_mats=True)
        mats, texs = testscenes.mat_hall_materials()
        scene = compile_mesh(verts, idx, max_path_len=args.mpl,
                             emitter=emitter, materials=mats,
                             tex_images=texs)
    else:
        verts, idx = getattr(testscenes, make_name)(tris)
        scene = compile_mesh(verts, idx, max_path_len=args.mpl,
                             emitter=emitter)
    # measured per-tier renderer policy (round-4 A/B: the hall/crown
    # tier routes ALL pool traversals to tiled + staged compaction —
    # all-packet 0.122 vs all-tiled 0.521 Msamples/s on hall)
    policy = select_render_policy(scene.device)
    cam = Camera.make(eye, dirv, (0, 1, 0), fov, W, H)
    film = film_mod.new_film(W, H)
    film = render_iteration_persistent(scene.device, cam, film, W, H,
                                       spp, 0, **policy)
    # force a small host fetch: block_until_ready returns early on some
    # remote XLA programs (ROADMAP round-2 session-3 — a bigscene timing
    # once read 11,603 Mrays/s); ~30 ms tunnel cost per fetch is <2% of
    # a renderer iteration
    _ = np.asarray(film[:1])
    times = []
    for it in range(1, args.iters + 1):
        t0 = time.perf_counter()
        film = render_iteration_persistent(scene.device, cam, film,
                                           W, H, spp, it, **policy)
        _ = np.asarray(film[:1])
        times.append(time.perf_counter() - t0)
    ms = np.sort(W * H * spp / np.asarray(times) / 1e6)
    mean_lum = float(np.asarray(film).mean()) / (args.iters + 1)
    p = policy.get("packet", False)
    eng = {True: "packet", False: f"tiled-c{policy.get('compact', 0)}"}.get(
        p, p)  # string values ("dense", "hbm", ...) print as themselves
    print(f"{scene_name} : render({W}x{H} spp{spp} mpl{args.mpl}, "
          f"traversal={eng}) : "
          f"{ms[len(ms) // 2]:.2f} Msamples/s "
          f"(min {ms[0]:.2f}, max {ms[-1]:.2f}, n={args.iters}; "
          f"mean film {mean_lum:.4f})", flush=True)


if __name__ == "__main__":
    sys.exit(main())
