"""Attribute the persistent-renderer step cost (round 3, VERDICT item 3).

Monkeypatch-ablates one subsystem at a time out of the wavefront step and
times a full cornell iteration for each variant; the deltas attribute the
~98% of the step cost that is not traversal (ROADMAP round-2 session-3).

Caveat: ablations that fake hits or directions change path lengths, so
their deltas are indicative, not exact; the splat/gather/light/emit
ablations preserve trip counts (control flow depends on RNG + hit
geometry, which those leave untouched or replace with fixed-but-live
values).

--tiny: 160x120 spp1, 1 timing iter — a CPU smoke run that exercises every
monkeypatch path (the real run happens unattended on the chip; a TypeError
in a patched signature must not be discovered there).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

TINY = "--tiny" in sys.argv
if TINY:
    jax.config.update("jax_platforms", "cpu")

from rodent_tpu.render import film as film_mod
from rodent_tpu.render import integrator
from rodent_tpu.render.camera import Camera
from rodent_tpu.render.compiler import compile_obj, select_packet
from rodent_tpu.io import png


def timed(fn, film0, iters):
    # render_iteration_persistent donates its film argument — each timing
    # pass needs a fresh buffer or the second variant hits a deleted array
    f = fn(jnp.array(film0))
    _ = np.asarray(f[:4])
    t0 = time.perf_counter()
    for _ in range(iters):
        f = fn(f)
    _ = np.asarray(f[:4])
    return (time.perf_counter() - t0) / iters


def main():
    want = (sys.argv[sys.argv.index("--scene") + 1]
            if "--scene" in sys.argv else "cornell")
    if want in ("hall", "mathall"):
        # hall-260K at a reduced res: attributes the reference-config
        # renderer rows (benchmark --mode renderer); per-step re-sort on
        # like the sweep. mathall = same geometry with the full-MTL
        # material set (textured kd, mix, phong, glass, mirror —
        # converter.cpp:859-927 coverage) so the shading stages are
        # timed on every BSDF kind, not just diffuse.
        from rodent_tpu.render.compiler import compile_mesh
        from rodent_tpu.utils.testscenes import make_hall, \
            mat_hall_materials
        name = want
        rich = want == "mathall"
        verts, idx = make_hall(2_000 if TINY else 260_000,
                               rich_mats=rich)
        mk = {}
        if rich:
            mats, texs = mat_hall_materials()
            mk = {"materials": mats, "tex_images": texs}
        scene = compile_mesh(verts, idx, max_path_len=20,
                             emitter="inside", **mk)
        W0, H0 = (96, 64) if TINY else (480, 272)
        spp = 1 if TINY else 2
        iters = 1 if TINY else 3
        cam = Camera.make((2.5, 5.0, 5.0), (1.0, -0.12, 0.02), (0, 1, 0),
                          60.0, W0, H0)
    else:
        name = "cornell"
        ref = png.read_png("/root/reference/testing/ref-cornell.png")[..., :3]
        H0, W0 = (120, 160) if TINY else ref.shape[:2]
        spp = 1 if TINY else 4
        iters = 1 if TINY else 5
        scene = compile_obj("/root/reference/testing/cornell_box.obj",
                            max_path_len=64)
        cam = Camera.make((0, 1, 2.7), (0, 0, -1), (0, 1, 0), 60.0, W0, H0)
    packet = select_packet(scene.device)
    sort = bool(packet) and name in ("hall", "mathall")
    if name == "mathall":
        # the production policy (measured pool rule + engine routing),
        # exactly what benchmark --mode renderer runs
        from rodent_tpu.render.compiler import select_render_policy
        policy = select_render_policy(scene.device)
        packet = policy.pop("packet", packet)
        sort = policy.pop("sort", sort)
    else:
        policy = {}
    total = W0 * H0 * spp
    print(f"{name} {W0}x{H0} spp{spp} total {total} packet={packet} "
          f"sort={sort} policy={policy}")

    def run(it0):
        def fn(film):
            return integrator.render_iteration_persistent(
                scene.device, cam, film, W0, H0, spp, it0, packet=packet,
                sort=sort, **policy)
        return fn

    film0 = film_mod.new_film(W0, H0)

    def clear():
        integrator.render_iteration_persistent.clear_cache()

    base = timed(run(1), film0, iters)
    print(f"baseline: {base*1e3:7.1f} ms/iter "
          f"({total/base/1e6:5.2f} Msamples/s)")

    def report(name, dt):
        print(f"{name}: {dt*1e3:7.1f} ms/iter "
              f"(delta {1e3*(base-dt):6.1f} ms, "
              f"{100.0*(base-dt)/base:5.1f}% of step)")

    # ---- ablation: film splat -> no-op (the persistent loop uses the
    # planar form; patch both so either path is covered) ----
    real_splat = integrator._splat
    real_splat_planar = integrator._splat_planar

    def no_splat(film, pixel, color, mask):
        # keep the data dependence on color so nothing else is DCE'd
        return film + jnp.sum(color[0]) * 0.0

    def no_splat_planar(planes, pixel, color, mask):
        s = jnp.sum(color[0]) * 0.0
        return tuple(p + s for p in planes)

    integrator._splat = no_splat
    integrator._splat_planar = no_splat_planar
    clear()
    report("no-splat", timed(run(1), film0, iters))
    integrator._splat = real_splat
    integrator._splat_planar = real_splat_planar

    # ---- ablation: surface/vertex gathers -> row-0 broadcast ----
    from rodent_tpu.core import tiles as tiles_mod
    real_gather = tiles_mod.gather_cols

    def fake_gather(table, idx):
        C = table.shape[1]
        r = idx.shape[0]
        rows = jnp.broadcast_to(table[0][:, None, None], (C, r, 128))
        return rows + 0.0 * idx[None].astype(table.dtype)

    tiles_mod.gather_cols = fake_gather
    integrator.gather_cols = fake_gather
    clear()
    report("no-gathers", timed(run(1), film0, iters))
    tiles_mod.gather_cols = real_gather
    integrator.gather_cols = real_gather

    # ---- ablation: texture-bank fetches -> flat gray (mathall: the
    # bilinear 4-texel gathers behind textured kd/ks/Ke) ----
    if "textures" in scene.device:
        real_bank = integrator._sample_bank

        def fake_bank(scene_, tex_id, uv):
            g = uv[0] * 0 + 0.5
            return (g, g, g)

        integrator._sample_bank = fake_bank
        clear()
        report("no-texture-fetch", timed(run(1), film0, iters))
        integrator._sample_bank = real_bank

    # ---- ablation: camera emission (RNG seeding + jitter + ray setup),
    # paid at pool init AND at every regeneration ----
    real_emit = integrator._emit_camera

    def fake_emit(camera, width, height, sample, iteration, pix):
        like = pix.astype(jnp.float32)
        from rodent_tpu.core import vmath as vm
        org = vm.splat(camera.eye, like=like)
        d = vm.normalize(vm.splat(camera.dir, like=like))
        rnd = pix.astype(jnp.uint32) | jnp.uint32(1)
        return org, d, rnd

    integrator._emit_camera = fake_emit
    clear()
    report("no-camera-emit*", timed(run(1), film0, iters))
    integrator._emit_camera = real_emit

    # ---- ablation: light sampling (pick + sample_direct + emission) ----
    from rodent_tpu.render import light as light_mod
    real_sample_direct = light_mod.sample_direct
    real_emission = light_mod.emission

    def fake_sample_direct(lights, lidx, rnd, point):
        from rodent_tpu.core.rng import randf
        _, rnd = randf(rnd)   # same two draws as the real sampler, so the
        _, rnd = randf(rnd)   # RNG stream (and RR path lengths) match
        like = lidx.astype(jnp.float32)
        one3 = (like * 0 + 1.0,) * 3
        out = {"pos": one3, "intensity": one3, "cos": like * 0 + 1.0,
               "pdf_area": like * 0 + 1.0,
               "has_area": lidx >= 0, "valid": lidx >= 0}
        if "ke_tex" in lights:
            out["ke_tex"] = jnp.full_like(lidx, -1)
            out["uv"] = (like * 0, like * 0)
        return out, rnd

    def fake_emission(lights, light_id, out_dir):
        like = light_id.astype(jnp.float32)
        out = {"intensity": (like * 0,) * 3, "pdf_area": like * 0 + 1.0,
               "valid": light_id >= 0}
        if "ke_tex" in lights:
            out["ke_tex"] = jnp.full_like(light_id, -1)
        return out

    light_mod.sample_direct = fake_sample_direct
    light_mod.emission = fake_emission
    integrator.light_mod = light_mod
    clear()
    report("no-light-sampling*", timed(run(1), film0, iters))
    light_mod.sample_direct = real_sample_direct
    light_mod.emission = real_emission

    # ---- ablation: BSDF eval_pdf + sample -> fixed diffuse-ish values
    # (keeps RR/depth decisions on the same RNG draws) ----
    from rodent_tpu.render import bsdf as bsdf_mod
    real_eval = bsdf_mod.eval_pdf
    real_sample = bsdf_mod.sample

    def fake_eval(mat, surf, in_dir, out_dir, kinds=None):
        one = surf["uv"][0] * 0 + 0.31830987
        return (one, one, one), one

    def fake_sample(mat, surf, rnd, out_dir, kinds=None):
        from rodent_tpu.core.rng import randf
        _, rnd = randf(rnd)
        _, rnd = randf(rnd)
        one = surf["uv"][0] * 0 + 1.0
        return surf["n"], one, one, (one, one, one), rnd

    bsdf_mod.eval_pdf = fake_eval
    bsdf_mod.sample = fake_sample
    integrator.bsdf_mod = bsdf_mod
    clear()
    report("no-bsdf*", timed(run(1), film0, iters))
    bsdf_mod.eval_pdf = real_eval
    bsdf_mod.sample = real_sample

    # ---- ablation: shadow traversal off (NEE visibility = unoccluded) ----
    real_traverse = integrator._traverse

    def no_shadow_traverse(scene_, rays, any_hit=False, **kw):
        if any_hit:
            shp = rays["tmin"].shape
            return {"t": rays["tmax"], "u": jnp.zeros(shp),
                    "v": jnp.zeros(shp),
                    "prim_id": jnp.full(shp, -1, jnp.int32),
                    "geom_id": jnp.full(shp, -1, jnp.int32)}
        return real_traverse(scene_, rays, any_hit=any_hit, **kw)

    integrator._traverse = no_shadow_traverse
    clear()
    report("no-shadow-trace", timed(run(1), film0, iters))

    # ---- ablation: ALL traversal off ----
    def no_traverse(scene_, rays, any_hit=False, **kw):
        shp = rays["tmin"].shape
        # pretend everything hits prim 0 at t=1 (keeps paths alive-ish)
        return {"t": jnp.ones(shp), "u": jnp.zeros(shp),
                "v": jnp.zeros(shp),
                "prim_id": jnp.zeros(shp, jnp.int32),
                "geom_id": jnp.zeros(shp, jnp.int32)}

    integrator._traverse = no_traverse
    clear()
    report("no-traverse-at-all*", timed(run(1), film0, iters))
    integrator._traverse = real_traverse
    print("(* = ablation perturbs path lengths/content; indicative only)")

    # ---- pool sweep at the current optimum's neighborhood ----
    clear()
    pools = (1 << 12,) if TINY else (1 << 13, 1 << 15, 1 << 17)
    for pool in pools:
        def fnp(film, pool=pool):
            return integrator.render_iteration_persistent(
                scene.device, cam, film, W0, H0, spp, 1,
                packet=packet, sort=sort,
                **{**policy, "pool": pool})
        dt = timed(fnp, film0, iters=min(iters, 3))
        print(f"pool {pool>>10}K: {dt*1e3:7.1f} ms/iter "
              f"({total/dt/1e6:5.2f} Msamples/s)")

    # ---- per-step sort A/B (hall mode runs sort=True baseline): the
    # argsort + 11-array permute per traversal vs its coherence win ----
    if sort:
        for mode_s, label in ((False, "sort-off"), ("pool", "sort-pool")):
            def fns(film, mode_s=mode_s):
                return integrator.render_iteration_persistent(
                    scene.device, cam, film, W0, H0, spp, 1,
                    packet=packet, sort=mode_s, **policy)
            dt = timed(fns, film0, iters=min(iters, 3))
            print(f"{label}: {dt*1e3:7.1f} ms/iter "
                  f"({total/dt/1e6:5.2f} Msamples/s)")
        for k in (2, 4):
            def fnpk(film, k=k):
                return integrator.render_iteration_persistent(
                    scene.device, cam, film, W0, H0, spp, 1,
                    packet=packet, sort="pool",
                    **{**policy, "retire_every": k})
            dt = timed(fnpk, film0, iters=min(iters, 3))
            print(f"sort-pool+retire{k}: {dt*1e3:7.1f} ms/iter "
                  f"({total/dt/1e6:5.2f} Msamples/s)")

    # ---- deferred retirement (retire_every=K): 1/K of the splat+regen
    # cost vs a utilization loss of ~death_rate*(K-1)/2; films are
    # bit-identical for any K ----
    for k in (2, 3, 4):
        def fnk(film, k=k):
            return integrator.render_iteration_persistent(
                scene.device, cam, film, W0, H0, spp, 1,
                packet=packet, sort=sort,
                **{**policy, "retire_every": k})
        dt = timed(fnk, film0, iters=min(iters, 3))
        print(f"retire_every {k}: {dt*1e3:7.1f} ms/iter "
              f"({total/dt/1e6:5.2f} Msamples/s)")


if __name__ == "__main__":
    main()
