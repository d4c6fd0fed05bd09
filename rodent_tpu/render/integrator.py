"""Wavefront path tracer.

The reference processes paths breadth-first as a resident ray stream:
generate -> traverse -> sort-by-shader -> shade -> compact -> shadow-trace
-> accumulate (cpu_trace, src/render/mapping_cpu.impala:352-473;
gpu_streaming_trace, src/render/mapping_gpu.impala:308-369). Its shading
callbacks implement next-event estimation with MIS against BSDF sampling,
specular skips, and clamped Russian roulette
(make_path_tracing_renderer, src/render/renderer.impala:62-163).

TPU mapping: one fixed-capacity megabatch of rays (all pixels x samples of
one pass) advances through a jax.lax.while_loop over bounces. There is no
per-lane divergence to fight, so the sort/compaction stages of the
reference become masks: dead rays ride along as no-ops (their traversal
stacks are empty, so they cost nothing inside the traversal loop). Film
accumulation is a scatter-add keyed by pixel id.

The estimator matches renderer.impala term for term:
- camera emitter seeds RNG with FNV(sample, iter, x, y) and jitters the
  pixel (:26-40);
- on_hit: emissive surfaces accumulate contrib * intensity * mis_weight
  where mis_weight = 1/(1 + state.mis * t^2 / cos * pdf_lightpick *
  emit.pdf_area) (:110-121);
- on_shadow: uniform light pick, geometry term, MIS vs bsdf pdf for area
  lights, shadow ray over [eps, 1-eps] of the unnormalized direction
  (:76-108);
- on_bounce: russian roulette clamped at 0.75, contrib *= color * cos /
  (pdf * rr), mis = specular ? 0 : 1/pdf (:123-152).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import sampling
from ..core.math import FLT_MAX, dot, lerp2, make_orthonormal_basis, normalize
from ..core.rng import randf, seed_camera_rays
from ..traversal.api import make_rays
from ..traversal.tiled import occluded_tiled as occluded
from ..traversal.tiled import traverse_tiled as traverse
from . import bsdf as bsdf_mod
from . import light as light_mod

OFFSET = 1e-3  # shadow/bounce epsilon (renderer.impala:64)


def surface_element(scene, rays, hit):
    """make_tri_mesh_geometry's surface element
    (src/render/geometry.impala:21-54), batched."""
    prim = jnp.maximum(hit["prim_id"], 0)
    tri = scene["indices"][prim]          # (B, 4): v0, v1, v2, mat
    i0, i1, i2 = tri[:, 0], tri[:, 1], tri[:, 2]
    u, v = hit["u"], hit["v"]

    face_n = scene["face_normals"][prim]
    n0 = scene["normals"][i0]
    n1 = scene["normals"][i1]
    n2 = scene["normals"][i2]
    normal = normalize(lerp2(n0, n1, n2, u, v))
    is_entering = dot(rays["dir"], face_n) <= 0.0
    point = rays["org"] + rays["dir"] * hit["t"][:, None]
    face_normal = jnp.where(is_entering[:, None], face_n, -face_n)
    shade_n = jnp.where(dot(rays["dir"], normal)[:, None] <= 0.0,
                        normal, -normal)
    t_, b_, n_ = make_orthonormal_basis(shade_n)

    t0 = scene["texcoords"][i0]
    t1 = scene["texcoords"][i1]
    t2 = scene["texcoords"][i2]
    uv = lerp2(t0, t1, t2, u, v)

    return {
        "is_entering": is_entering,
        "point": point,
        "face_normal": face_normal,
        "t": t_, "b": b_, "n": n_,
        "uv": uv,
        "prim": prim,
        "mat_id": tri[:, 3],
    }


def gather_material(scene, mat_id):
    """Gathers per-ray material parameters from the static material table
    (the converter's per-material shader closures, converter.cpp:859-927,
    turned into data)."""
    mt = scene["mat_table"]
    return {
        "kind": mt["kind"][mat_id],
        "kd": mt["kd"][mat_id],
        "ks": mt["ks"][mat_id],
        "ns": mt["ns"][mat_id],
        "ni": mt["ni"][mat_id],
        "tf": mt["tf"][mat_id],
        "mix_k": mt["mix_k"][mat_id],
        "emissive": mt["emissive"][mat_id],
        "kd_tex": mt["kd_tex"][mat_id],
        "ks_tex": mt["ks_tex"][mat_id],
    }


def emit_camera_rays(camera, width, height, sample, iteration, pixel_ids):
    """make_camera_emitter (renderer.impala:26-40)."""
    x = (pixel_ids % width).astype(jnp.uint32)
    y = (pixel_ids // width).astype(jnp.uint32)
    rnd = seed_camera_rays(jnp.uint32(sample), jnp.uint32(iteration), x, y)
    jx, rnd = randf(rnd)
    jy, rnd = randf(rnd)
    kx = 2.0 * (x.astype(jnp.float32) + jx) / width - 1.0
    ky = 1.0 - 2.0 * (y.astype(jnp.float32) + jy) / height
    org, d = camera.generate_rays(kx, ky)
    return org, d, rnd


def _shade(scene, rays, hit, state, film):
    """One shading stage: on_hit accumulation, NEE shadow rays,
    bounce sampling. Returns (film, next_rays, next_state, alive)."""
    alive = state["alive"] & (hit["prim_id"] >= 0)
    surf = surface_element(scene, rays, hit)
    mat = gather_material(scene, surf["mat_id"])
    if "textures" in scene:
        # textured kd/ks override constants (converter.cpp:877-895)
        from . import texture as tx
        kd_t = tx.sample_bank(scene["textures"], scene["tex_hw"],
                              mat["kd_tex"], surf["uv"])
        ks_t = tx.sample_bank(scene["textures"], scene["tex_hw"],
                              mat["ks_tex"], surf["uv"])
        mat["kd"] = jnp.where((mat["kd_tex"] >= 0)[:, None], kd_t, mat["kd"])
        mat["ks"] = jnp.where((mat["ks_tex"] >= 0)[:, None], ks_t, mat["ks"])
    rnd = state["rnd"]
    out_dir = -rays["dir"]
    num_lights = scene["num_lights"]
    pdf_lightpick = 1.0 / num_lights

    # ---- on_hit: emissive surface seen by the path ----
    light_id = scene["light_ids"][surf["prim"]]
    emit = light_mod.emission(scene["lights"], light_id, out_dir)
    cos_o = dot(out_dir, surf["n"])
    next_mis = state["mis"] * hit["t"] * hit["t"] / jnp.where(
        cos_o != 0.0, cos_o, 1.0)
    mis_w = 1.0 / (1.0 + next_mis * pdf_lightpick * emit["pdf_area"])
    hit_light = alive & mat["emissive"] & surf["is_entering"]
    emit_color = state["contrib"] * emit["intensity"] * mis_w[:, None]
    film = film.at[state["pixel"]].add(
        jnp.where(hit_light[:, None], emit_color, 0.0), mode="drop")

    # ---- on_shadow: next-event estimation (skipped for specular) ----
    do_nee = alive & ~bsdf_mod.is_specular(mat)
    lidx, rnd = light_mod.pick_uniform(num_lights, rnd)
    ls, rnd = light_mod.sample_direct(scene["lights"], lidx, rnd,
                                      surf["point"])
    light_vec = ls["pos"] - surf["point"]
    vis = dot(light_vec, surf["n"])
    nee_ok = do_nee & (vis > 0.0) & (ls["cos"] > 0.0)
    inv_d = 1.0 / jnp.maximum(jnp.sqrt(dot(light_vec, light_vec)), 1e-30)
    inv_d2 = inv_d * inv_d
    in_dir = light_vec * inv_d[:, None]
    pdf_e_c, pdf_e = bsdf_mod.eval_pdf(mat, surf, in_dir, out_dir)
    pdf_e = jnp.where(ls["has_area"], pdf_e, 0.0)
    pdf_l = ls["pdf_area"] * pdf_lightpick
    inv_pdf_l = 1.0 / pdf_l
    cos_e = vis * inv_d
    cos_l = ls["cos"]
    mis = jnp.where(ls["has_area"],
                    1.0 / (1.0 + pdf_e * cos_l * inv_d2 * inv_pdf_l), 1.0)
    geom = cos_e * cos_l * inv_d2 * inv_pdf_l
    shadow_color = (ls["intensity"] * state["contrib"] * pdf_e_c
                    * (geom * mis)[:, None])

    shadow_rays = make_rays(surf["point"], light_vec,
                            jnp.full_like(vis, OFFSET),
                            jnp.full_like(vis, 1.0 - OFFSET))
    # dead/skipped rays traverse nothing: tmax < tmin empties the test
    shadow_rays["tmax"] = jnp.where(nee_ok, shadow_rays["tmax"], -1.0)
    blocked = occluded(scene["bvh"], shadow_rays)
    add_shadow = nee_ok & ~blocked
    film = film.at[state["pixel"]].add(
        jnp.where(add_shadow[:, None], shadow_color, 0.0), mode="drop")

    # ---- on_bounce: russian roulette + BSDF sampling ----
    rr = sampling.russian_roulette(state["contrib"], 0.75)
    u_rr, rnd = randf(rnd)
    continue_ = alive & (state["depth"] < scene["max_path_len"]) & (u_rr < rr)
    new_dir, pdf, cos, color, rnd = bsdf_mod.sample(mat, surf, rnd, out_dir)
    spec = bsdf_mod.is_specular(mat)
    contrib = state["contrib"] * color * (
        cos / jnp.maximum(pdf * rr, 1e-30))[:, None]
    new_mis = jnp.where(spec, 0.0, 1.0 / jnp.maximum(pdf, 1e-30))

    next_rays = make_rays(surf["point"], new_dir,
                          jnp.full_like(vis, OFFSET),
                          jnp.full_like(vis, FLT_MAX))
    next_state = {
        "rnd": rnd,
        "contrib": jnp.where(continue_[:, None], contrib, 0.0),
        "mis": new_mis,
        "depth": state["depth"] + 1,
        "pixel": state["pixel"],
        "alive": continue_,
    }
    # dead rays must not traverse: zero out their extent
    next_rays["tmax"] = jnp.where(continue_, next_rays["tmax"], -1.0)
    return film, next_rays, next_state, continue_


def render_sample(scene, camera, film, width, height, sample, iteration,
                  pixel_ids=None):
    """Traces one sample per pixel to completion (one wavefront pass).
    pixel_ids indexes the *global* image; film may be a local shard the
    same length as pixel_ids' local span when used under shard_map (the
    scatter indices must then be local — see parallel.mesh)."""
    if pixel_ids is None:
        pixel_ids = jnp.arange(width * height, dtype=jnp.int32)
    n = pixel_ids.shape[0]
    org, d, rnd = emit_camera_rays(camera, width, height, sample, iteration,
                                   pixel_ids)
    rays = make_rays(org, d, jnp.zeros(n, jnp.float32),
                     jnp.full(n, FLT_MAX, jnp.float32))
    # film scatter index: local when film is a shard (len(film) == n)
    film_index = (pixel_ids if film.shape[0] != n
                  else jnp.arange(n, dtype=jnp.int32))
    state = {
        "rnd": rnd,
        "contrib": jnp.ones((n, 3), jnp.float32),
        "mis": jnp.zeros(n, jnp.float32),
        "depth": jnp.zeros(n, jnp.int32),
        "pixel": film_index,
        "alive": jnp.ones(n, bool),
    }

    def cond(c):
        return jnp.any(c["state"]["alive"])

    def body(c):
        rays, state, film = c["rays"], c["state"], c["film"]
        hit = traverse(scene["bvh"], rays)
        film, rays, state, _ = _shade(scene, rays, hit, state, film)
        return {"rays": rays, "state": state, "film": film}

    out = jax.lax.while_loop(cond, body,
                             {"rays": rays, "state": state, "film": film})
    return out["film"]


@partial(jax.jit, static_argnames=("camera", "width", "height", "spp"),
         donate_argnames=("film",))
def render_iteration(scene, camera, film, width, height, spp, iteration):
    """One progressive iteration: spp wavefront passes accumulated into the
    film (driver.cpp:279-325 render loop body)."""
    def body(s, film):
        return render_sample(scene, camera, film, width, height, s,
                             iteration)
    return jax.lax.fori_loop(0, spp, body, film)


@partial(jax.jit, static_argnames=("camera", "width", "height", "spp",
                                   "pool"),
         donate_argnames=("film",))
def render_iteration_persistent(scene, camera, film, width, height, spp,
                                iteration, pool=None):
    """Persistent-wavefront iteration: the TPU form of the reference's
    megakernel regeneration trick (gpu_mega_kernel_trace,
    src/render/mapping_gpu.impala:371-474 — dead paths immediately pull the
    next sample id from a work counter so lanes never idle).

    A fixed pool of ray slots processes all width*height*spp samples of
    the iteration: when a path terminates, its slot re-emits a camera ray
    for the next unprocessed sample. Utilization stays ~100% until the
    tail instead of decaying per bounce. RNG seeds depend only on
    (sample, iter, x, y) (renderer.impala:27-33), so the accumulated film
    is bit-identical to render_iteration's.
    """
    total = width * height * spp
    pool = pool or min(total, 1 << 18)

    # initial emission: slots take global sample ids 0..pool-1
    sample_id = jnp.arange(pool, dtype=jnp.int32)
    next_free = jnp.int32(pool)

    def emit_rays(sample_id):
        pix = jnp.minimum(sample_id // spp, width * height - 1)
        s = sample_id % spp
        x = (pix % width).astype(jnp.uint32)
        y = (pix // width).astype(jnp.uint32)
        from ..core.rng import seed_camera_rays
        rnd = seed_camera_rays(s.astype(jnp.uint32), jnp.uint32(iteration),
                               x, y)
        jx, rnd = randf(rnd)
        jy, rnd = randf(rnd)
        kx = 2.0 * (x.astype(jnp.float32) + jx) / width - 1.0
        ky = 1.0 - 2.0 * (y.astype(jnp.float32) + jy) / height
        org, d = camera.generate_rays(kx, ky)
        return org, d, rnd, pix

    org, d, rnd, pix = emit_rays(sample_id)
    n = pool
    rays = make_rays(org, d, jnp.zeros(n, jnp.float32),
                     jnp.full(n, FLT_MAX, jnp.float32))
    live0 = sample_id < total
    rays["tmax"] = jnp.where(live0, rays["tmax"], -1.0)
    state = {
        "rnd": rnd,
        "contrib": jnp.ones((n, 3), jnp.float32),
        "mis": jnp.zeros(n, jnp.float32),
        "depth": jnp.zeros(n, jnp.int32),
        "pixel": pix,
        "alive": live0,
    }

    def cond(c):
        return jnp.any(c["state"]["alive"])

    def body(c):
        rays, state, film = c["rays"], c["state"], c["film"]
        next_free = c["next_free"]
        hit = traverse(scene["bvh"], rays)
        film, rays, state, _ = _shade(scene, rays, hit, state, film)

        # regenerate: dead slots pull the next unprocessed sample id
        dead = ~state["alive"]
        order = jnp.cumsum(dead.astype(jnp.int32)) - 1
        new_id = next_free + order
        can = dead & (new_id < total)
        next_free = jnp.minimum(next_free + jnp.sum(dead.astype(jnp.int32)),
                                jnp.int32(total))

        norg, nd, nrnd, npix = emit_rays(jnp.where(can, new_id, 0))
        fresh = make_rays(norg, nd, jnp.zeros(n, jnp.float32),
                          jnp.full(n, FLT_MAX, jnp.float32))
        canc = can[:, None]
        rays = {kk: jnp.where(canc if rays[kk].ndim == 2 else can,
                              fresh[kk], rays[kk]) for kk in rays}
        state = {
            "rnd": jnp.where(can, nrnd, state["rnd"]),
            "contrib": jnp.where(canc, 1.0, state["contrib"]),
            "mis": jnp.where(can, 0.0, state["mis"]),
            "depth": jnp.where(can, 0, state["depth"]),
            "pixel": jnp.where(can, npix, state["pixel"]),
            "alive": state["alive"] | can,
        }
        return {"rays": rays, "state": state, "film": film,
                "next_free": next_free}

    out = jax.lax.while_loop(cond, body, {
        "rays": rays, "state": state, "film": film,
        "next_free": next_free})
    return out["film"]
