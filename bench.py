#!/usr/bin/env python
"""Headline benchmark: primary-ray traversal throughput (Mrays/s) on one
chip, the reference's bench_traversal metric
(tools/bench_traversal/bench_traversal.cpp prints "N Mrays/sec").

Workload: a 260K-triangle sponza-class procedural hall (the sponza mesh is
not redistributable; see rodent_tpu/utils/testscenes.py), 1024x1024
coherent primary rays, closest-hit BVH8 traversal. vs_baseline is measured
against the BASELINE.json north-star target of 100 Mrays/s/chip.

Prints ONE JSON line.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from rodent_tpu.accel import build_bvh
    from rodent_tpu.traversal.api import bvh_to_device, make_rays
    from rodent_tpu.traversal.pallas_packet import traverse_packet as traverse
    from rodent_tpu.utils.testscenes import hall_primary_rays, make_hall

    verts, idx = make_hall(260_000)
    bvh = build_bvh(verts, idx, arity=8)
    dev = bvh_to_device(bvh)

    org, dirs = hall_primary_rays(1024, 1024)
    n = len(org)
    rays = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                     jnp.zeros(n, jnp.float32),
                     jnp.full(n, 3.402823466e38, jnp.float32))
    # octant+Morton ordering: coherent tiles cut the packet kernel's
    # shared-stack union divergence (~+37% measured)
    from rodent_tpu.traversal.sorting import sort_rays
    rays, _ = sort_rays(rays, verts.min(0), verts.max(0))

    chunk = 1048576
    fn = jax.jit(lambda r: traverse(dev, r))
    chunks = [jax.tree.map(lambda x: x[i:i + chunk], rays)
              for i in range(0, n, chunk)]
    # warmup / compile
    hit = fn(chunks[0])
    jax.block_until_ready(hit["t"])
    hit_frac = float(jnp.mean((hit["prim_id"] >= 0).astype(jnp.float32)))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        hits = [fn(c) for c in chunks]
    jax.block_until_ready(hits[-1]["t"])
    dt = time.perf_counter() - t0
    mrays = n * iters / dt / 1e6

    print(json.dumps({
        "metric": "hall260k_primary_traversal",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
        "detail": {
            "rays": n, "iters": iters, "seconds": round(dt, 3),
            "hit_fraction": round(hit_frac, 4),
            "backend": jax.default_backend(),
            "num_nodes": int(bvh.num_nodes),
            "num_packets": int(bvh.num_packets),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
