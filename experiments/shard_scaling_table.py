#!/usr/bin/env python
"""Multi-chip scaling table (round-4 VERDICT item 6).

Real multi-chip hardware is unavailable here, so this produces the
quantities that determine scaling without wall-clock theater:

  (a) MEASURED per-strip wavefront step counts for px = 1/2/4/8 on a
      hall render (each strip's exact persistent-loop trip count, run
      shard-by-shard via parallel.accounting.measure_shard_steps). The
      sharded iteration psum-barriers once per iteration, so
      max/mean(steps) is the load-imbalance slowdown a real mesh pays.
  (b) ANALYTIC padding waste + collective bytes/device per iteration
      (shard_plan) at both the probe resolution and the reference bench
      config 1920x1088 spp4 (bench.sh:60-85 geometry).

Runs forced-CPU (no TPU needed; step counts are backend-independent).

Usage: python experiments/shard_scaling_table.py [--wh 192x108]
       [--tris 20000] [--spp 2] [--pool 4096]
"""
import sys
sys.path.insert(0, "/root/repo")
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wh", default="192x108")
    ap.add_argument("--tris", type=int, default=20_000)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--pool", type=int, default=4096)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from rodent_tpu.parallel.accounting import (measure_shard_steps,
                                                shard_plan)
    from rodent_tpu.render.camera import Camera
    from rodent_tpu.render.compiler import compile_mesh
    from rodent_tpu.utils import testscenes

    W, H = (int(x) for x in args.wh.split("x"))
    verts, idx = testscenes.make_hall(args.tris)
    scene = compile_mesh(verts, idx, max_path_len=20, emitter="inside")
    cam = Camera.make((2.5, 5.0, 5.0), (1.0, -0.12, 0.02), (0, 1, 0),
                      60.0, W, H)
    print(f"scene=hall tris={len(idx)//4} {W}x{H} spp{args.spp} "
          f"pool={args.pool} backend={jax.default_backend()}")

    print("\n# px-axis scaling (n_sp=1): measured per-strip step counts")
    print("n_px | steps/strip | max/mean | padded_px (frac) | "
          "psum B/dev")
    for n_px in (1, 2, 4, 8):
        plan = shard_plan(W, H, args.spp, n_px)
        steps = measure_shard_steps(
            scene.device, cam, W, H, args.spp, n_px,
            pool=min(args.pool, plan["pixels_local"] * args.spp))
        row = steps[0]
        print(f"{n_px:4d} | {' '.join(str(int(s)) for s in row):<28} | "
              f"{row.max() / row.mean():8.3f} | "
              f"{plan['padded_pixels']:4d} ({plan['padded_fraction']:.5f})"
              f" | {plan['collective_bytes_per_device']:6d}")

    print("\n# sp-axis collective volume (analytic, ring all-reduce of "
          "the (local,3) f32 partial film)")
    print("config | n_px | n_sp | local_px | psum B/dev/iter | "
          "padded frac")
    for label, w, h, spp in ((f"probe {W}x{H}", W, H, args.spp),
                             ("reference 1920x1088 spp4", 1920, 1088, 4)):
        for n_px, n_sp in ((1, 1), (4, 2), (2, 4), (8, 1), (4, 4)):
            if spp % n_sp:
                continue
            p = shard_plan(w, h, spp, n_px, n_sp)
            print(f"{label:<24} | {n_px:4d} | {n_sp:4d} | "
                  f"{p['pixels_local']:8d} | "
                  f"{p['collective_bytes_per_device']:12d} | "
                  f"{p['padded_fraction']:.6f}")


if __name__ == "__main__":
    main()
