#!/usr/bin/env python
"""Independent throughput cross-check: a calibrated per-pop cost model
(round-3/4 VERDICT "what's missing #3" — no second independent perf
measurement exists; Embree/CUDA baselines are impossible here).

Method: the packet kernel's time per tile is modeled as

    t_tile = N_node * (a + b*rows) + N_leaf * (c + d*rows)

(a,c: fixed scalar/SMEM cost per pop; b,d: vector-issue cost per row of
the (rows,128) tile — the round-2 ablations measured the kernel as pure
vector-issue-bound, ROADMAP).  The four coefficients are least-squares
fitted on ONE scene (hall) across tile heights, then used to PREDICT
other workloads (crown, powerplant-hbm) from nothing but their counted
node/leaf pops — an instrumented count, not a timing.  Prediction vs
measurement on the held-out scenes is the independent check: if a
claimed Mrays/s number were inflated (or a regression hid in a config),
it would sit far from the model's line.

Usage: python experiments/cost_model.py [--cal-rows 8,16,24,32,48]
       [--scenes crown,powerplant] [--iters 3] [--blocks 3]
"""
import sys
sys.path.insert(0, "/root/repo")
import argparse
import time

import numpy as np


def counted_pops(pp, dev, rays, rows, n, jnp, tris_hbm=False):
    """(node_pops, leaf_pops) per tile via the kernel's SMEM counters."""
    packed, nt = pp.pack_rays(rays, rows)
    outs = pp._call_kernel(dev, packed, nt, rows, False, False,
                           count_pops=True, multi=1, tris_hbm=tris_hbm)
    cnt = np.asarray(outs[5])
    total = cnt[::8, 0].astype(np.int64)
    leaf = cnt[1::8, 0].astype(np.int64)
    return total - leaf, leaf


def timed(fn, dev, rays, n, iters, blocks):
    import numpy as np
    out = fn(dev, rays)
    _ = np.asarray(out["t"][:8])
    s = []
    for _b in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(dev, rays)
        _ = np.asarray(out["t"][:8])
        s.append(n * iters / (time.perf_counter() - t0) / 1e6)
    s.sort()
    return s[len(s) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cal-rows", default="8,16,24,32,48")
    ap.add_argument("--scenes", default="crown,powerplant")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--blocks", type=int, default=3)
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

    def load(scene):
        cfg = {"hall": (260_000, 1, 12, False),
               "crown": (800_000, 1, 12, False),
               "powerplant": (5_000_000, 0, 12, True)}
        tris, quality, lt, hbm = cfg[scene]
        verts, idx = getattr(testscenes, f"make_{scene}")(tris)
        bvh = build_bvh(verts, idx, arity=8, packet=8, quality=quality,
                        leaf_threshold=lt)
        dev = bvh_to_device(bvh)
        org, dirs = getattr(testscenes, f"{scene}_primary_rays")(1024, 1024)
        n = len(org)
        rays = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                         jnp.zeros(n, jnp.float32),
                         jnp.full(n, 3.402823466e38, jnp.float32))
        rays, _ = sort_rays(rays, verts.min(0), verts.max(0))
        return dev, rays, n, hbm

    # ---- calibration: hall across tile heights ----
    dev, rays, n, _ = load("hall")
    rows_list = [int(r) for r in args.cal_rows.split(",")]
    A, y = [], []
    print("calibration (hall):")
    for rows in rows_list:
        node, leaf = counted_pops(pp, dev, rays, rows, n, jnp)
        fn = jax.jit(lambda d, r, rr=rows: pp.traverse_packet(
            d, r, tile_rows=rr, multi=1))
        mrays = timed(fn, dev, rays, n, args.iters, args.blocks)
        nt = len(node)
        t_tile = (n / (mrays * 1e6)) / nt * 1e9       # ns per tile
        A.append([node.mean(), node.mean() * rows,
                  leaf.mean(), leaf.mean() * rows])
        y.append(t_tile)
        print(f"  rows={rows:2d}  node/tile={node.mean():6.1f} "
              f"leaf/tile={leaf.mean():6.1f}  {mrays:6.2f} Mrays/s  "
              f"t_tile={t_tile/1e3:.1f} us", flush=True)
    coef, res, *_ = np.linalg.lstsq(np.asarray(A), np.asarray(y),
                                    rcond=None)
    a, b, c, d = coef
    print(f"fit: node pop = {a:.0f} + {b:.1f}*rows ns | "
          f"leaf pop = {c:.0f} + {d:.1f}*rows ns", flush=True)
    pred_cal = np.asarray(A) @ coef
    for rows, p, m in zip(rows_list, pred_cal, y):
        print(f"  rows={rows:2d} fit {p/1e3:6.1f} us vs {m/1e3:6.1f} us "
              f"({p/m:+.1%})", flush=True)

    # ---- held-out predictions ----
    print("held-out predictions:")
    for scene in args.scenes.split(","):
        dev, rays, n, hbm = load(scene)
        for rows in (16, 32):
            node, leaf = counted_pops(pp, dev, rays, rows, n, jnp,
                                      tris_hbm=hbm)
            fn = jax.jit(lambda d, r, rr=rows, h=hbm: pp.traverse_packet(
                d, r, tile_rows=rr, multi=1, tris_hbm=h,
                prefetch=h))
            mrays = timed(fn, dev, rays, n, args.iters, args.blocks)
            t_pred = (node.mean() * (a + b * rows)
                      + leaf.mean() * (c + d * rows))
            mrays_pred = rows * 128 / t_pred * 1e3
            print(f"  {scene}{'-hbm' if hbm else ''} rows={rows:2d}: "
                  f"predicted {mrays_pred:6.2f} vs measured "
                  f"{mrays:6.2f} Mrays/s ({mrays / mrays_pred:.0%} of "
                  f"model)", flush=True)


if __name__ == "__main__":
    main()
