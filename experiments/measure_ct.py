"""Round-5 carry-top kernel A/B on the real chip: hall primary row.

Attacks VERDICT r4 item 1 (the ~600 ns fixed per-pop scalar cost,
pallas_packet.py:38-44): the carry-top body keeps the next pop in the
while carry (stack.impala:25-50 trick), replaces the 8-key Batcher sort
with a min-fold select, and fuses the slab test to b*inv + inv_org.
Usage: python experiments/measure_ct.py [rows ...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rodent_tpu.accel import build_bvh
from rodent_tpu.traversal.api import bvh_to_device, make_rays
from rodent_tpu.traversal.pallas_packet import traverse_packet
from rodent_tpu.traversal.sorting import sort_rays
from rodent_tpu.utils.compile import rjit
from rodent_tpu.utils.testscenes import hall_primary_rays, make_hall


def bench(fn, rays, n, iters=5, blocks=5):
    hit = fn(rays)
    jax.block_until_ready(hit["t"])
    samples = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iters):
            hit = fn(rays)
        jax.block_until_ready(hit["t"])
        samples.append(n * iters / (time.perf_counter() - t0) / 1e6)
    samples.sort()
    return samples[len(samples) // 2], samples[0], samples[-1]


def main():
    rows_list = [int(a) for a in sys.argv[1:]] or [24, 32]
    verts, idx = make_hall(260_000)
    bvh = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
    dev = bvh_to_device(bvh)
    org, dirs = hall_primary_rays(1024, 1024)
    n = len(org)
    prim = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                     jnp.zeros(n, jnp.float32),
                     jnp.full(n, 3.402823466e38, jnp.float32))
    prim, _ = sort_rays(prim, verts.min(0), verts.max(0))

    configs = []
    for rows in rows_list:
        configs += [
            (f"legacy       {rows}x1", dict(tile_rows=rows, multi=1,
                                            carry_top=False)),
            (f"ct-fold      {rows}x1", dict(tile_rows=rows, multi=1,
                                            carry_top=True, select="fold")),
            (f"ct-sort      {rows}x1", dict(tile_rows=rows, multi=1,
                                            carry_top=True, select="sort")),
            (f"ct-fold-nofma {rows}x1", dict(tile_rows=rows, multi=1,
                                             carry_top=True, select="fold",
                                             fma_slab=False)),
        ]
    for name, kw in configs:
        fn = rjit(lambda r, kw=kw: traverse_packet(dev, r, **kw))
        try:
            med, lo, hi = bench(fn, prim, n)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            continue
        print(f"{name}: {med:.2f} Mrays/s  [{lo:.2f}, {hi:.2f}]")


if __name__ == "__main__":
    main()
