#!/usr/bin/env python
"""A/B the persistent renderer's per-distribution engine policies.

Round-4 VERDICT item 1: the hall render at the reference bench config
(1920x1088 spp4 mpl20) ran 0.15 Msamples/s with ~97% of the step in
traversal on the all-packet policy, while tiled-c (staged compaction)
wins the incoherent distributions 4.96/4.81 vs packet 2.72/3.24 Mrays/s
(BENCH_r03). This sweeps the routing policies the integrator now
supports on a reduced-res hall (and optionally crown) render:

  all-packet     packet kernel for every traversal (r3 behavior)
  bounce-tiled   main pool traversal -> tiled-c5; shadow -> packet
  both-tiled     main + shadow -> tiled-c5
  split          depth-0 -> packet, bounce -> tiled-c5, shadow -> packet
  split-sh-t     depth-0 -> packet, bounce+shadow -> tiled-c5
  all-tiled      tiled-c5 everywhere (no packet calls at all)

Films are bit-identical across policies (engines are exact-parity);
asserted once on the first two variants.

Usage: python experiments/ab_render_policy.py [--scene hall|crown]
       [--wh 960x544] [--spp 2] [--iters 3] [--policies a,b,...]
"""
import sys
sys.path.insert(0, "/root/repo")
import argparse
import time

import numpy as np


POLICIES = {
    "all-packet": dict(packet=True),
    "bounce-tiled": dict(packet=True, bounce_packet=False, compact=5),
    "both-tiled": dict(packet=True, bounce_packet=False,
                       shadow_packet=False, compact=5),
    "split": dict(packet=True, bounce_packet=False, compact=5,
                  depth_split=True),
    "split-sh-t": dict(packet=True, bounce_packet=False,
                       shadow_packet=False, compact=5, depth_split=True),
    "all-tiled": dict(packet=False, compact=5),
    # knob refinements under the all-tiled winner (round-4 session 3)
    "all-tiled-c0": dict(packet=False, compact=0),
    "all-tiled-c3": dict(packet=False, compact=3),
    "all-tiled-c8": dict(packet=False, compact=8),
    # round 5: sequential sub-batches bound the lockstep tail per chunk;
    # under sort=none chunks have no trip neighborhoods (hypothesis:
    # no gain), under sort=pool they do (hypothesis: sub flips the
    # round-4 "sort loses" sign) — run with --sort none AND --sort pool
    "all-tiled-sb8": dict(packet=False, compact=5, sub=8),
    "all-tiled-sb16": dict(packet=False, compact=5, sub=16),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="hall")
    ap.add_argument("--tris", type=int, default=0)
    ap.add_argument("--wh", default="960x544")
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--mpl", type=int, default=20)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--sort", default="pool")
    ap.add_argument("--retire", type=int, default=1)
    ap.add_argument("--pool", type=int, default=0,
                    help="override the persistent pool size (0 = default)")
    ap.add_argument("--pools", default="",
                    help="comma list of pool sizes: each policy row runs "
                         "once per pool (amortizes the scene build)")
    ap.add_argument("--policies", default=",".join(POLICIES))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from rodent_tpu.render import film as film_mod
    from rodent_tpu.render.camera import Camera
    from rodent_tpu.render.compiler import compile_mesh
    from rodent_tpu.render.integrator import render_iteration_persistent
    from rodent_tpu.utils import testscenes

    W, H = (int(x) for x in args.wh.split("x"))
    # cameras match tools/benchmark.py _RENDER_CAMS so rows are
    # comparable to results_tpu_r3.txt
    make, cam_cfg = {
        "hall": (testscenes.make_hall,
                 ((2.5, 5.0, 5.0), (1.0, -0.12, 0.02), 60.0, "inside")),
        "mathall": (testscenes.make_hall,
                    ((2.5, 5.0, 5.0), (1.0, -0.12, 0.02), 60.0,
                     "inside")),
        "crown": (testscenes.make_crown,
                  ((4.2, 1.8, 1.2), (-4.2, -1.4, -1.2), 42.0, "above")),
        "powerplant": (testscenes.make_powerplant,
                       ((-30.0, 60.0, -30.0), (130.0, -40.0, 130.0),
                        55.0, "above")),
    }[args.scene]
    dflt = {"hall": 260_000, "mathall": 260_000, "crown": 800_000,
            "powerplant": 2_000_000}[args.scene]
    eye, dirv, fov, emitter = cam_cfg
    if args.scene == "mathall":
        verts, idx = testscenes.make_hall(args.tris or dflt,
                                          rich_mats=True)
        mats, texs = testscenes.mat_hall_materials()
        scene = compile_mesh(verts, idx, max_path_len=args.mpl,
                             emitter=emitter, materials=mats,
                             tex_images=texs)
    else:
        verts, idx = make(args.tris or dflt)
        scene = compile_mesh(verts, idx, max_path_len=args.mpl,
                             emitter=emitter)
    cam = Camera.make(eye, dirv, (0, 1, 0), fov, W, H)
    print(f"scene={args.scene} tris={len(idx)//4} {W}x{H} spp{args.spp} "
          f"mpl{args.mpl} sort={args.sort} retire={args.retire} "
          f"backend={jax.default_backend()}")

    pools = ([int(x) for x in args.pools.split(",")] if args.pools
             else [args.pool])
    ref_film = None
    for name0 in args.policies.split(","):
      for pool in pools:
        kw = POLICIES[name0]
        name = f"{name0}-p{pool // 1024}K" if len(pools) > 1 else name0

        def step(film, it, kw=kw, pool=pool):
            return render_iteration_persistent(
                scene.device, cam, film, W, H, args.spp, it,
                sort=(args.sort if args.sort in ("pool",)
                      else args.sort == "true"),
                retire_every=args.retire,
                **(dict(pool=pool) if pool else {}), **kw)

        try:
            film = film_mod.new_film(W, H)
            film = step(film, 0)
            _ = np.asarray(film[:1])
            times = []
            for it in range(1, args.iters + 1):
                t0 = time.perf_counter()
                film = step(film, it)
                _ = np.asarray(film[:1])
                times.append(time.perf_counter() - t0)
            ms = np.sort(W * H * args.spp / np.asarray(times) / 1e6)
            fn = np.asarray(film)
            if ref_film is None:
                ref_film = fn / (args.iters + 1)
                ident = "ref"
            else:
                ident = ("bit-identical" if np.array_equal(
                    ref_film, fn / (args.iters + 1)) else
                    f"maxdiff {np.abs(ref_film - fn / (args.iters + 1)).max():.2e}")
            print(f"{name:>12}: {ms[len(ms) // 2]:.3f} Msamples/s "
                  f"(min {ms[0]:.3f} max {ms[-1]:.3f} n={args.iters}) "
                  f"[{ident}]", flush=True)
        except Exception as e:
            print(f"{name:>12}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:100]})", flush=True)


if __name__ == "__main__":
    main()
