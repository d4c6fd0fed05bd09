#!/usr/bin/env python
"""San-Miguel-class demo: ~5M-triangle scene, built by the native
builder, traversed/rendered at scale.

Two modes (BASELINE.md north star: "multi-chip tiled render on a
San-Miguel-class scene"):

  --tpu   single-chip real-TPU run: build 5M-tri powerplant, traverse
          1M primary rays (BVH ~0.5 GB of tables > VMEM, so this
          exercises the XLA HBM dual-queue path) and render a frame;
          reports wall-clock + HBM table sizes.
  --mesh  8-virtual-device CPU mesh: the same scene (scaled down for the
          1-core host) ray-sharded via shard_map across devices,
          proving the multi-chip path compiles + executes and that
          per-device results splice bit-identically to single-device.

Real multi-chip hardware is not reachable from this host (one v5e chip
behind a tunnel); the mesh run is the honest stand-in the driver also
validates via __graft_entry__.dryrun_multichip.
"""
import sys
sys.path.insert(0, "/root/repo")
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--mesh", action="store_true")
    ap.add_argument("--tris", type=int, default=5_000_000)
    args = ap.parse_args()

    import jax
    if args.mesh:
        import os
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from rodent_tpu.accel import build_bvh
    from rodent_tpu.traversal.api import bvh_to_device, make_rays
    from rodent_tpu.traversal.tiled import traverse_tiled
    from rodent_tpu.traversal.sorting import sort_rays
    from rodent_tpu.utils.testscenes import (make_powerplant,
                                             powerplant_primary_rays)

    tris = args.tris if args.tpu else 400_000
    t0 = time.perf_counter()
    verts, idx = make_powerplant(tris)
    t_scene = time.perf_counter() - t0
    ntris = len(idx) // 4
    t0 = time.perf_counter()
    # binned tier: the sweep-SBVH is for quality-critical small/mid
    # scenes; 5M tris build in seconds with the binned binary + DP
    bvh = build_bvh(verts, idx, arity=8, packet=8, quality=0)
    t_build = time.perf_counter() - t0
    dev = bvh_to_device(bvh)
    sizes = {k: v.nbytes / 1e6 for k, v in dev.items()
             if hasattr(v, "nbytes")}
    print(f"scene: {ntris} tris ({t_scene:.1f}s gen), "
          f"bvh: {bvh.num_nodes} nodes / {bvh.num_packets} packets "
          f"({t_build:.1f}s build)")
    print("device tables (MB):",
          {k: round(v, 1) for k, v in sizes.items()},
          f"total {sum(sizes.values()):.0f} MB "
          f"({'HBM path: > ~110 MB VMEM' if sum(sizes.values()) > 110 else 'VMEM-resident'})")

    side = 1024
    org, dirs = powerplant_primary_rays(side, side)
    n = len(org)
    rays = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                     jnp.zeros(n, jnp.float32),
                     jnp.full(n, 3.402823466e38, jnp.float32))
    rays, _ = sort_rays(rays, verts.min(0), verts.max(0))

    if args.mesh:
        from rodent_tpu.parallel.mesh import make_mesh, traverse_sharded
        mesh = make_mesh(n_px=4, n_sp=2)
        hit1 = traverse_tiled(dev, rays)
        t0 = time.perf_counter()
        hit8 = traverse_sharded(dev, rays, mesh=mesh)
        jax.block_until_ready(hit8["t"])
        dt = time.perf_counter() - t0
        same = bool(jnp.all(hit1["t"] == hit8["t"]))
        print(f"mesh: 8-device ray-sharded traversal {n} rays in "
              f"{dt:.1f}s (incl. compile); bit-identical to "
              f"single-device: {same}")
        assert same
        return

    # dev must be a jit ARGUMENT here: closed-over device tables are
    # baked into the HLO as constants, and a ~0.5 GB constant blob
    # overflows the remote-compile tunnel (HTTP 413)
    from rodent_tpu.traversal.pallas_packet import traverse_packet

    def bench(fn, label):
        hit = fn(dev, rays)
        _ = np.asarray(hit["t"][:128])   # force completion (the remote
        # backend's block_until_ready returns early on some programs)
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            hit = fn(dev, rays)
        _ = np.asarray(hit["t"][:128])
        dt = (time.perf_counter() - t0) / iters
        hf = float(jnp.mean((hit["prim_id"] >= 0).astype(jnp.float32)))
        print(f"tpu single-chip [{label}]: {ntris}-tri primary "
              f"{n / dt / 1e6:.2f} Mrays/s (hit fraction {hf:.3f})")

    # production big-scene path: node table VMEM-resident, Tri rows
    # DMA'd from HBM per leaf pop (pallas_packet tris_hbm mode)
    bench(jax.jit(lambda d, r: traverse_packet(d, r, tile_rows=32,
                                               tris_hbm=True)),
          "packet tris_hbm")
    # reference point: the XLA dual-queue HBM-gather path
    bench(jax.jit(lambda d, r: traverse_tiled(d, r)), "tiled")


if __name__ == "__main__":
    main()
