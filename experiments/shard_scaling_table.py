#!/usr/bin/env python
"""Multi-chip scaling table on the virtual mesh (round-4 VERDICT item 6).

Real multi-chip hardware is unavailable here (one tunneled chip), so the
scaling evidence is analytic + measured-per-shard accounting on the
8-virtual-device CPU mesh (parallel.accounting): per-device wavefront
step counts (the whole per-device cost — the psum barriers once per
iteration, so max/mean is the imbalance factor a real mesh pays),
padded-work fraction, and collective bytes/device/iteration.

Prints the px = 1/2/4/8 table for the cornell fixture plus the analytic
rows for the reference-config hall render (1920x1088 spp4).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python experiments/shard_scaling_table.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from rodent_tpu.parallel.accounting import (measure_shard_steps,
                                                shard_plan)
    from rodent_tpu.render.camera import Camera
    from rodent_tpu.render.compiler import compile_obj

    W, H, spp = 64, 48, 4
    scene = compile_obj("/root/reference/testing/cornell_box.obj",
                        max_path_len=8)
    cam = Camera.make((0, 1, 2.7), (0, 0, -1), (0, 1, 0), 60.0, W, H)

    print(f"cornell {W}x{H} spp{spp} (measured per-shard steps, "
          f"virtual CPU mesh)")
    print(" n_px n_sp  px_pixels pad_frac  coll_B/dev  "
          "steps max/mean (imbalance)")
    for n_px, n_sp in ((1, 1), (2, 1), (4, 1), (8, 1), (4, 2)):
        plan = shard_plan(W, H, spp, n_px=n_px, n_sp=n_sp)
        steps = measure_shard_steps(scene.device, cam, W, H, spp,
                                    n_px=n_px, n_sp=n_sp, pool=1024)
        imb = steps.max() / steps.mean()
        print(f"  {n_px:3d}  {n_sp:3d}  {plan['pixels_local']:9d} "
              f"{plan['padded_fraction']:8.5f} "
              f"{plan['collective_bytes_per_device']:11d}  "
              f"{steps.max():5d}/{steps.mean():7.1f} ({imb:.3f})",
              flush=True)

    print("\nhall reference config 1920x1088 spp4 (analytic plan rows)")
    print(" n_px n_sp  px_pixels pad_frac  coll_B/dev")
    for n_px, n_sp in ((1, 1), (2, 1), (4, 1), (8, 1), (4, 2), (2, 4)):
        plan = shard_plan(1920, 1088, 4, n_px=n_px, n_sp=n_sp)
        print(f"  {n_px:3d}  {n_sp:3d}  {plan['pixels_local']:9d} "
              f"{plan['padded_fraction']:8.5f} "
              f"{plan['collective_bytes_per_device']:11d}")


if __name__ == "__main__":
    main()
