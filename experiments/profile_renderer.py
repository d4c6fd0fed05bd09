"""Attribute the persistent-renderer step cost (round 3, VERDICT item 3).

Monkeypatch-ablates one subsystem at a time out of the wavefront step and
times a full cornell iteration for each variant; the deltas attribute the
~98% of the step cost that is not traversal (ROADMAP round-2 session-3).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from rodent_tpu.render import film as film_mod
from rodent_tpu.render import integrator
from rodent_tpu.render.camera import Camera
from rodent_tpu.render.compiler import compile_obj, packet_ok
from rodent_tpu.io import png


def timed(fn, film0, iters=5):
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
    ref = png.read_png("/root/reference/testing/ref-cornell.png")[..., :3]
    H0, W0 = ref.shape[:2]
    spp = 4
    scene = compile_obj("/root/reference/testing/cornell_box.obj",
                        max_path_len=64)
    packet = packet_ok(scene.device) and jax.default_backend() == "tpu"
    cam = Camera.make((0, 1, 2.7), (0, 0, -1), (0, 1, 0), 60.0, W0, H0)
    total = W0 * H0 * spp
    print(f"cornell {W0}x{H0} spp{spp} total {total} packet={packet}")

    def run(it0):
        def fn(film):
            return integrator.render_iteration_persistent(
                scene.device, cam, film, W0, H0, spp, it0, packet=packet)
        return fn

    film0 = film_mod.new_film(W0, H0)

    dt = timed(run(1), film0)
    base = dt
    print(f"baseline: {dt*1e3:7.1f} ms/iter "
          f"({total/dt/1e6:5.2f} Msamples/s)")

    # ---- ablation: film splat -> no-op ----
    real_splat = integrator._splat

    def no_splat(film, pixel, color, mask):
        # keep the data dependence on color so nothing else is DCE'd
        return film + jnp.sum(color[0]) * 0.0

    integrator._splat = no_splat
    integrator.render_iteration_persistent.clear_cache()
    dt = timed(run(1), film0)
    print(f"no-splat: {dt*1e3:7.1f} ms/iter  (delta {1e3*(base-dt):6.1f})")
    integrator._splat = real_splat

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
    integrator.render_iteration_persistent.clear_cache()
    dt = timed(run(1), film0)
    print(f"no-gathers: {dt*1e3:7.1f} ms/iter (delta {1e3*(base-dt):6.1f})")
    tiles_mod.gather_cols = real_gather
    integrator.gather_cols = real_gather

    # ---- ablation: shadow traversal off (NEE contribution zeroed) ----
    real_traverse = integrator._traverse

    def no_shadow_traverse(scene_, rays, any_hit=False, packet=False):
        if any_hit:
            shp = rays["tmin"].shape
            return {"t": rays["tmax"], "u": jnp.zeros(shp),
                    "v": jnp.zeros(shp),
                    "prim_id": jnp.full(shp, -1, jnp.int32),
                    "geom_id": jnp.full(shp, -1, jnp.int32)}
        return real_traverse(scene_, rays, any_hit, packet)

    integrator._traverse = no_shadow_traverse
    integrator.render_iteration_persistent.clear_cache()
    dt = timed(run(1), film0)
    print(f"no-shadow-trace: {dt*1e3:7.1f} ms/iter "
          f"(delta {1e3*(base-dt):6.1f})")

    # ---- ablation: ALL traversal off ----
    def no_traverse(scene_, rays, any_hit=False, packet=False):
        shp = rays["tmin"].shape
        # pretend everything hits prim 0 at t=1 (keeps paths alive-ish)
        return {"t": jnp.ones(shp), "u": jnp.zeros(shp),
                "v": jnp.zeros(shp),
                "prim_id": jnp.zeros(shp, jnp.int32),
                "geom_id": jnp.zeros(shp, jnp.int32)}

    integrator._traverse = no_traverse
    integrator.render_iteration_persistent.clear_cache()
    dt = timed(run(1), film0)
    print(f"no-traverse-at-all*: {dt*1e3:7.1f} ms/iter "
          f"(*different path lengths, indicative only)")
    integrator._traverse = real_traverse

    # ---- ablation: regeneration (cumsum+emit) -> plain die-off ----
    real_persistent = None  # structural; approximate via pool sweep below

    # ---- pool sweep at the current optimum's neighborhood ----
    integrator.render_iteration_persistent.clear_cache()
    for pool in (1 << 13, 1 << 15, 1 << 17):
        def fnp(film, pool=pool):
            return integrator.render_iteration_persistent(
                scene.device, cam, film, W0, H0, spp, 1, pool=pool,
                packet=packet)
        dt = timed(fnp, film0, iters=3)
        print(f"pool {pool>>10}K: {dt*1e3:7.1f} ms/iter "
              f"({total/dt/1e6:5.2f} Msamples/s)")


if __name__ == "__main__":
    main()
