#!/usr/bin/env python
"""Headline benchmark + full metric set on one chip.

Headline: primary-ray traversal throughput (Mrays/s), the reference's
bench_traversal metric ("N Mrays/sec", tools/bench_traversal). Detail
carries the reference's full distribution triple (primary / ao / bounces,
benchmarks/benchmark.py) plus the cornell quality gate (MSE vs
testing/ref-cornell.png at the ctest camera, cmake/test/run_rodent.cmake)
and renderer throughput (Msamples/s, driver.cpp:341-348).

Workload: a 260K-triangle sponza-class procedural hall (the sponza mesh
is not redistributable; see rodent_tpu/utils/testscenes.py), 1024x1024
rays. vs_baseline compares against the BASELINE.json north-star target of
100 Mrays/s/chip. Prints ONE JSON line.
"""
import json
import sys
import time

import numpy as np


def _bench_traversal(fn, rays, n, iters=5, blocks=5):
    """Median of `blocks` independent timed blocks of `iters` calls each
    (bench_traversal.cpp:336-391 reports avg/median/min over iterations;
    single-block timing sat inside the chip's measured +-8% run-to-run
    band and made round-over-round deltas uninterpretable). Returns
    (median, min, max, last_hit) in Mrays/s.

    Timing barrier: block_until_ready is VALIDATED against a sync
    fetch for the straight-line programs timed here (tiled-c 4.84 vs
    4.90 fetched, probe_sb_depth.py) but returns EARLY for lax.map
    programs on this remote backend — do not time a lax.map-wrapped
    engine with this helper."""
    import jax
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
    return (samples[len(samples) // 2], samples[0], samples[-1], hit)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from rodent_tpu.accel import build_bvh
    from rodent_tpu.traversal.api import bvh_to_device, make_rays
    from rodent_tpu.traversal.pallas_packet import traverse_packet
    from rodent_tpu.traversal.sorting import sort_rays
    from rodent_tpu.utils.compile import rjit
    from rodent_tpu.utils.testscenes import hall_primary_rays, make_hall

    detail = {"backend": jax.default_backend()}

    # ---- traversal triple on the hall scene ----
    verts, idx = make_hall(260_000)
    # packet kernel economics favor Tri8 leaves (measured: 24.5 -> 30.0)
    bvh = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
    dev = bvh_to_device(bvh)
    detail["num_nodes"] = int(bvh.num_nodes)
    detail["num_packets"] = int(bvh.num_packets)
    # round-5 challenger: Tri16 + cheap DP leaves (multi-line VMEM rows)
    # measured 71.2 vs pk8's 70.0 with overlapping bands
    # (race_hall_packet.py) — race the BUILDS at the fixed ct-32x1
    # winner config instead of two row configs of one build
    bvh16 = build_bvh(verts, idx, arity=8, packet=16, leaf_threshold=12,
                      leaf_cost=0.6)
    dev16 = bvh_to_device(bvh16)

    org, dirs = hall_primary_rays(1024, 1024)
    n = len(org)
    prim = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                     jnp.zeros(n, jnp.float32),
                     jnp.full(n, 3.402823466e38, jnp.float32))
    # octant+Morton ordering: coherent tiles cut the packet kernel's
    # shared-stack union divergence
    prim_sorted, _ = sort_rays(prim, verts.min(0), verts.max(0))
    # round 5: the carry-top body (next pop in the while carry +
    # min-fold child select, _kernel_ct) wins at 32x1 (71.2 vs legacy
    # 67.0, experiments/measure_ct.py); ct-24x1 always lost the r5
    # races, so the second lane now races the Tri16+lc0.6 BUILD at the
    # same ct-32x1 config (71.2 vs 70.0 with overlapping bands,
    # race_hall_packet.py). ao/bounces below keep the pk8 build and
    # legacy 16x2 default (their measured winner).
    mrays_primary, p_lo, p_hi, hit = 0.0, 0.0, 0.0, None
    for bname, bdev_ in (("pk8", dev), ("pk16", dev16)):
        fn_packet = rjit(lambda r, d=bdev_: traverse_packet(
            d, r, tile_rows=32, multi=1, carry_top=True))
        m, lo, hi, h = _bench_traversal(fn_packet, prim_sorted, n)
        detail[f"primary_{bname}_ct32_mrays"] = round(m, 2)
        if m > mrays_primary:
            mrays_primary, p_lo, p_hi, hit = m, lo, hi, h
            detail["primary_config"] = f"{bname}-ct-32x1"
    detail["primary_mrays"] = round(mrays_primary, 2)
    detail["primary_band"] = [round(p_lo, 2), round(p_hi, 2)]
    detail["primary_hit_fraction"] = round(float(jnp.mean(
        (hit["prim_id"] >= 0).astype(jnp.float32))), 4)

    # secondary distributions from the primary hit points (ray_gen role)
    from rodent_tpu.utils.testscenes import secondary_rays_from_trace
    hit_un = traverse_packet(dev, prim)  # unsorted order for hit points
    t = np.asarray(hit_un["t"])
    pid = np.asarray(hit_un["prim_id"])

    from rodent_tpu.traversal.tiled import traverse_tiled
    for kind, any_hit in (("ao", True), ("bounces", False)):
        o2, d2, tmin2, tmax2 = secondary_rays_from_trace(
            kind, org, dirs, t, pid, verts, idx.reshape(-1, 4))
        rays2 = make_rays(jnp.asarray(o2), jnp.asarray(d2),
                          jnp.asarray(tmin2), jnp.asarray(tmax2))
        rays2, _ = sort_rays(rays2, verts.min(0), verts.max(0))
        # race both engines on the incoherent distributions and report
        # the best (the reference's tables list the best variant per
        # row). Round-2 state: packet (rows=16 + org9 sort + any-hit
        # deactivation + multi=2) ao 2.8 / bounces 3.3 vs tiled 1.4/1.2;
        # round 3 upgraded tiled with row-sharded gathers (2.16x on the
        # 43K-row Tri8 table) + staged compaction, so the winner is an
        # open question per distribution.
        best, best_eng = 0.0, None
        # round 5: a sub_batches=16 lane was tried and REMOVED — its
        # lax.map program defeats block_until_ready on this remote
        # backend (timed 7.9, honest sync-fetch timing says 4.08, i.e.
        # SLOWER than plain tiled-c: cone-sorted chunks share the
        # global max-trips, so the chunking only adds serialization;
        # experiments/probe_sb_depth.py, results_tpu_r5.txt)
        for eng_name, eng in (
                ("packet", lambda r, ah: traverse_packet(dev, r,
                                                         any_hit=ah)),
                ("tiled-c", lambda r, ah: traverse_tiled(
                    dev, r, any_hit=ah, compact_stages=5))):
            try:
                fn2 = rjit(lambda r, ah=any_hit, e=eng: e(r, ah))
                # 5-block median, same standard as the primary row and
                # bench_traversal.cpp:336-391 (round-4 VERDICT weak #5:
                # 3x2 under-sampled the +-9% chip session envelope)
                mrays2, lo2, hi2, _h = _bench_traversal(fn2, rays2, n,
                                                        iters=2, blocks=5)
            except Exception as e:  # keep the driver-run bench alive
                print(f"# {kind}/{eng_name} failed "
                      f"({type(e).__name__})", file=sys.stderr)
                continue
            detail[f"{kind}_{eng_name}_mrays"] = round(mrays2, 2)
            detail[f"{kind}_{eng_name}_band"] = [round(lo2, 2),
                                                 round(hi2, 2)]
            if mrays2 > best:
                best, best_eng = mrays2, eng_name
        detail[f"{kind}_mrays"] = round(best, 2)
        detail[f"{kind}_engine"] = best_eng

    # ---- San-Miguel-class big scene (tris-in-HBM packet mode) ----
    # 4.3M-tri powerplant: node table (33 MB) VMEM-resident, Tri8 table
    # (420 MB) stays in HBM with one DMA per leaf pop. Timing forces a
    # small host fetch: the remote backend's block_until_ready returns
    # early on some programs.
    if jax.default_backend() == "tpu":
        from rodent_tpu.utils.testscenes import (make_powerplant,
                                                 powerplant_primary_rays)
        bverts, bidx = make_powerplant(5_000_000)
        # round 5: Tri24 leaf packets (336-float rows = 3 VMEM lines,
        # one DMA per leaf pop) + cheap DP leaves cut leaf DMAs/tile
        # 255 -> ~124 and lift the row 7.67 -> 10.70 Mrays/s at 16x2
        # (experiments/sweep_bigscene_leaf.py, results_tpu_r5.txt); the
        # packet-size knee is at 24 (pk32 drops to 9.95: lane math
        # overtakes the saved pop overhead), leaf_cost at 0.45-0.6
        # (0.3 overshoots: packets merge past the DMA win)
        bbvh = build_bvh(bverts, bidx, arity=8, packet=24, quality=0,
                         leaf_threshold=12, leaf_cost=0.45)
        bdev = bvh_to_device(bbvh)
        borg, bdirs = powerplant_primary_rays(1024, 1024)
        bn = len(borg)
        brays = make_rays(jnp.asarray(borg), jnp.asarray(bdirs),
                          jnp.zeros(bn, jnp.float32),
                          jnp.full(bn, 3.402823466e38, jnp.float32))
        brays, _ = sort_rays(brays, bverts.min(0), bverts.max(0))
        # kernel defaults (rows=16 x multi=2 + exact next-pop prefetch):
        # 14.65 Mrays/s with prefetch vs 13.12 blocking on powerplant-2M
        # (results_tpu_r3.txt prefetch A/B). Fall back to the blocking
        # transport if Mosaic rejects the prefetch DMA on the driver's
        # jaxlib — and RECORD which transport ran (BENCH_r03's 7.47 vs
        # the sweep's 14.65 was unexplainable because it didn't).
        for pf in (True, False):
            bfn = rjit(lambda d, r, pf=pf: traverse_packet(
                d, r, tris_hbm=True, prefetch=pf))
            try:
                bhit = bfn(bdev, brays)
                _ = np.asarray(bhit["t"][:128])
                detail["bigscene_transport"] = ("prefetch" if pf
                                                else "blocking")
                break
            except Exception as e:  # pragma: no cover - device-specific
                if not pf:
                    raise
                print(f"# prefetch lowering failed ({type(e).__name__}); "
                      f"falling back", file=sys.stderr)
        # blocks of 3 calls with ONE sync fetch per block: the device
        # queue serializes the calls, so fetching the last result's head
        # completes the block while amortizing the ~30 ms tunnel fetch
        # to 1/3 per call (a per-call fetch deflated this row 15-20%
        # relative to the r3 rows it is compared against)
        bs = []
        for _ in range(5):  # 5-block median: every row, same standard
            t0 = time.perf_counter()
            for _ in range(3):
                bhit = bfn(bdev, brays)
            _ = np.asarray(bhit["t"][:128])
            bs.append(3 * bn / (time.perf_counter() - t0) / 1e6)
        bs.sort()
        detail["bigscene_tris"] = len(bidx) // 4
        detail["bigscene_mrays"] = round(bs[len(bs) // 2], 2)
        detail["bigscene_band"] = [round(bs[0], 2), round(bs[-1], 2)]
        del bdev, bhit, brays

    # ---- cornell quality gate + renderer throughput ----
    from rodent_tpu.io import png
    from rodent_tpu.render import film as film_mod
    from rodent_tpu.render.camera import Camera
    from rodent_tpu.render.compiler import (compile_obj,
                                            select_render_policy)
    from rodent_tpu.render.integrator import render_iteration_persistent

    ref = png.read_png("/root/reference/testing/ref-cornell.png")[..., :3]
    H0, W0 = ref.shape[:2]
    # 50 iters = the ctest config (cmake/test/run_rodent.cmake); MSE at
    # fewer iterations is Monte-Carlo-noise-dominated and not comparable
    iters, spp = 50, 4
    scene = compile_obj("/root/reference/testing/cornell_box.obj",
                        max_path_len=64)
    # engine policy by measurement (select_render_policy): cornell's
    # dense tier keeps the packet kernel + deferred retirement (13.3 vs
    # 10.7 Msamples/s, results_tpu_r3.txt); bigger scenes route all pool
    # traversals to tiled-c (round-4 A/B)
    policy = select_render_policy(scene.device)
    cam = Camera.make((0, 1, 2.7), (0, 0, -1), (0, 1, 0), 60.0, W0, H0)
    film = film_mod.new_film(W0, H0)
    # compile pass (iteration 0), then timed passes
    film = render_iteration_persistent(scene.device, cam, film, W0, H0,
                                       spp, 0, **policy)
    # tiny host fetches bracket the timed loop: block_until_ready returns
    # early on some remote XLA programs (ROADMAP round-2 session-3)
    _ = np.asarray(film[:1])
    t0 = time.perf_counter()
    for it in range(1, iters):
        film = render_iteration_persistent(scene.device, cam, film, W0, H0,
                                           spp, it, **policy)
    _ = np.asarray(film[:1])
    dt = time.perf_counter() - t0
    img = film_mod.tonemap(film, W0, H0, iters)
    detail["cornell_mse_u8"] = round(film_mod.mse_u8(ref, img), 2)
    detail["cornell_msamples"] = round(
        W0 * H0 * spp * (iters - 1) / dt / 1e6, 2)
    detail["cornell_iters"] = iters

    print(json.dumps({
        "metric": "hall260k_primary_traversal",
        "value": round(mrays_primary, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_primary / 100.0, 4),
        "detail": detail,
    }))


if __name__ == "__main__":
    sys.exit(main())
