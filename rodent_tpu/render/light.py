"""Batched light sampling: point lights and (precomputed) triangle lights.

Semantics follow src/render/light.impala:
- triangle lights are area lights over a uniform-triangle AreaEmitter with
  precomputed normal + inverse area (make_precomputed_triangle_light,
  :140-154), exactly the converter's no-textured-emission fast path
  (converter.cpp:771-856);
- direct sampling returns (pos, intensity, pdf_area, pdf_dir, cos) with the
  make_direct_sample validity zeroing (:81-101);
- point lights emit color/(4*pi) with pdf_area 1 (:104-120).

Layout: per-ray positions/normals/colors are Vec3 tuples (core.vmath).
Per-ray light choice uses a select chain when the light count is small
(zero gathers — the generated match-table of the reference's main.impala,
converter.cpp:824-835, as data) and row gathers otherwise.
kind: 0 = point, 1 = triangle(area).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import sampling
from ..core import vmath as vm
from ..core.rng import randf, randi

POINT, TRIANGLE = 0, 1
from ..core.tiles import SELECT_CHAIN_ROWS as _SELECT_CHAIN_MAX  # noqa: E402,E501 - one tuned threshold (core.tiles documents the measurement)


def build_light_table(mesh, materials_ke, light_tri_mask, ke_tex=None):
    """Extracts triangle lights from emissive-material triangles, mirroring
    converter.cpp:771-856. Returns (table dict of numpy arrays, light_ids
    per triangle — 0 for non-lights, as the reference leaves them).

    ke_tex: optional per-material emission-texture ids (-1 = constant).
    When any light is textured, the table carries the light triangle's
    vertex uvs + per-light texture id; intensity then comes from the Ke
    texture at the surface point (the converter's has_map_ke branch,
    converter.cpp:794-806 — its generated code hands make_texture to
    make_triangle_light's Color slot, i.e. intent: textured radiance)."""
    tri_idx = mesh.tri_indices
    num_tris = len(tri_idx)
    light_ids = np.zeros(num_tris, np.int32)
    v0s, v1s, v2s, ns, inv_areas, colors = [], [], [], [], [], []
    uv0s, uv1s, uv2s, ktexs = [], [], [], []
    for t in np.nonzero(light_tri_mask)[0]:
        i0, i1, i2 = tri_idx[t]
        v0 = mesh.vertices[i0]
        v1 = mesh.vertices[i1]
        v2 = mesh.vertices[i2]
        n = np.cross(v1 - v0, v2 - v0)
        ln = np.linalg.norm(n)
        if ln <= 0.0 or not np.isfinite(ln):
            # degenerate emissive triangle (common in real OBJ exports):
            # zero area = zero power, and 1/ln would put NaN normals /
            # inf pdfs into the light table (NaN reaches the film via
            # the MIS weight of paths hitting the light). It can never
            # be hit either (MT rejects det == 0), so skip it entirely.
            continue
        inv_area = 1.0 / (0.5 * ln)
        light_ids[t] = len(v0s)
        v0s.append(v0)
        v1s.append(v1)
        v2s.append(v2)
        ns.append(n / ln)
        inv_areas.append(inv_area)
        colors.append(materials_ke[mesh.tri_materials[t]])
        if ke_tex is not None:
            uv0s.append(mesh.texcoords[i0])
            uv1s.append(mesh.texcoords[i1])
            uv2s.append(mesh.texcoords[i2])
            ktexs.append(ke_tex[mesh.tri_materials[t]])
    if not v0s:
        # dummy black point light (converter.cpp:848-850)
        return {
            "kind": np.zeros(1, np.int32),
            "v0": np.zeros((1, 3), np.float32),
            "v1": np.zeros((1, 3), np.float32),
            "v2": np.zeros((1, 3), np.float32),
            "n": np.asarray([[0, 0, 1]], np.float32),
            "inv_area": np.ones(1, np.float32),
            "color": np.zeros((1, 3), np.float32),
        }, light_ids
    table = {
        "kind": np.full(len(v0s), TRIANGLE, np.int32),
        "v0": np.asarray(v0s, np.float32),
        "v1": np.asarray(v1s, np.float32),
        "v2": np.asarray(v2s, np.float32),
        "n": np.asarray(ns, np.float32),
        "inv_area": np.asarray(inv_areas, np.float32),
        "color": np.asarray(colors, np.float32),
    }
    if ke_tex is not None and any(k >= 0 for k in ktexs):
        table["uv0"] = np.asarray(uv0s, np.float32)
        table["uv1"] = np.asarray(uv1s, np.float32)
        table["uv2"] = np.asarray(uv2s, np.float32)
        table["ke_tex"] = np.asarray(ktexs, np.int32)
    return table, light_ids


def pick_uniform(lights_n, rnd):
    """Uniform light pick like on_shadow (renderer.impala:83-85):
    (randi & 0x7FFFFFFF) % num_lights."""
    v, rnd = randi(rnd)
    return (v & 0x7FFFFFFF) % lights_n, rnd


def _row(table, key, light_idx):
    """Per-ray row of a light table column: select chain for small tables
    (fully fused, no gather), row gather otherwise."""
    col = table[key]
    n = col.shape[0]
    if n <= _SELECT_CHAIN_MAX:
        if col.ndim == 1:
            out = jnp.zeros(light_idx.shape, col.dtype) + col[0]
            for i in range(1, n):
                out = jnp.where(light_idx == i, col[i], out)
            return out
        # (n, k) -> component-tuple select chain over traced scalars
        zero = jnp.zeros(light_idx.shape, col.dtype)
        k = col.shape[1]
        out = tuple(zero + col[0, j] for j in range(k))
        for i in range(1, n):
            sel = tuple(jnp.where(light_idx == i, col[i, j], out[j])
                        for j in range(k))
            out = sel
        return out
    if col.ndim == 1:
        return col[light_idx.reshape(-1)].reshape(light_idx.shape)
    # component-column 1D gathers: (n, 3)-row gathers are the
    # multi-dim-trailing-gather pattern measured at ~100-150x slow
    # (traversal/api.py layout notes); XLA hoists the per-component
    # slices out of the render loop
    flatidx = light_idx.reshape(-1)
    return tuple(col[:, i][flatidx].reshape(light_idx.shape)
                 for i in range(col.shape[1]))


def sample_direct(table, light_idx, rnd, from_point):
    """Light.sample_direct for a per-ray chosen light.
    Returns (dict(pos Vec3, intensity Vec3, pdf_area, pdf_dir, cos,
    has_area), rnd)."""
    kind = _row(table, "kind", light_idx)
    u, rnd = randf(rnd)
    v, rnd = randf(rnd)

    v0 = _row(table, "v0", light_idx)
    v1 = _row(table, "v1", light_idx)
    v2 = _row(table, "v2", light_idx)
    n = _row(table, "n", light_idx)
    inv_area = _row(table, "inv_area", light_idx)
    color = _row(table, "color", light_idx)

    # sample_triangle (random.impala:49-59)
    pos_t = sampling.sample_triangle_c(u, v, v0, v1, v2)
    d = vm.sub(from_point, pos_t)
    cos_t = vm.dot(d, n) / jnp.maximum(vm.length(d), 1e-30)
    pdf_dir_t = cos_t * (1.0 / vm.PI)

    is_tri = kind == TRIANGLE
    pos = vm.where(is_tri, pos_t, v0)  # point light pos stored in v0
    intensity = vm.where(is_tri, color,
                         vm.scale(color, 1.0 / (4.0 * vm.PI)))
    pdf_area = jnp.where(is_tri, inv_area, 1.0)
    pdf_dir = jnp.where(is_tri, pdf_dir_t, 1.0 / (4.0 * vm.PI))
    cos = jnp.where(is_tri, cos_t, 1.0)

    # make_direct_sample validity (light.impala:81-101)
    valid = (pdf_area > 0.0) & (pdf_dir > 0.0) & (cos > 0.0)
    zero = vm.splat((0.0, 0.0, 0.0), like=cos)
    intensity = vm.where(valid, intensity, zero)
    pdf_area = jnp.where(valid, pdf_area, 1.0)
    pdf_dir = jnp.where(valid, pdf_dir, 1.0)
    cos = jnp.where(valid, cos, 0.0)

    out = {
        "pos": pos,
        "intensity": intensity,
        "pdf_area": pdf_area,
        "pdf_dir": pdf_dir,
        "cos": cos,
        "has_area": is_tri,
        "valid": valid,
    }
    if "ke_tex" in table:
        # uv at the sampled point, same barycentrics as pos_t (textured
        # emission: intensity overlaid by the integrator's bank sampler)
        uv0 = _row(table, "uv0", light_idx)
        uv1 = _row(table, "uv1", light_idx)
        uv2 = _row(table, "uv2", light_idx)
        flip = (u + v) > 1.0
        uu_ = jnp.where(flip, 1.0 - u, u)
        vv_ = jnp.where(flip, 1.0 - v, v)
        w_ = 1.0 - uu_ - vv_
        out["uv"] = tuple(w_ * a + uu_ * b + vv_ * c
                          for a, b, c in zip(uv0, uv1, uv2))
        out["ke_tex"] = _row(table, "ke_tex", light_idx)
    return out, rnd


def sample_emission(table, light_idx, rnd):
    """Light.sample_emission (light.impala:35-44): samples a point on the
    light and an outgoing direction. Point lights draw a uniform-sphere
    direction (light.impala:110-116); triangle lights draw a surface point
    plus a cosine-hemisphere direction around the precomputed normal
    (make_area_light:131-134). Used by light tracers / photon emission;
    the camera-path tracer itself only needs sample_direct.

    Returns (dict(pos, dir, intensity, pdf_area, pdf_dir, cos), rnd)."""
    kind = _row(table, "kind", light_idx)
    u, rnd = randf(rnd)
    v, rnd = randf(rnd)
    u2, rnd = randf(rnd)
    v2, rnd = randf(rnd)

    v0 = _row(table, "v0", light_idx)
    v1 = _row(table, "v1", light_idx)
    v2_ = _row(table, "v2", light_idx)
    n = _row(table, "n", light_idx)
    inv_area = _row(table, "inv_area", light_idx)
    color = _row(table, "color", light_idx)

    # triangle: pos ~ uniform on tri, dir ~ cosine hemisphere about n
    pos_t = sampling.sample_triangle_c(u, v, v0, v1, v2_)
    local, pdf_cos = sampling.sample_cosine_hemisphere_c(u2, v2)
    t_, b_, n_ = vm.onb(n)
    dir_t = vm.basis_mul(t_, b_, n_, local)
    cos_t = local[2]

    # point: pos = v0 (storage), dir ~ uniform sphere
    dir_p, pdf_sph = sampling.sample_uniform_sphere_c(u2, v2)

    is_tri = kind == TRIANGLE
    pos = vm.where(is_tri, pos_t, v0)
    dirv = vm.where(is_tri, dir_t, dir_p)
    intensity = vm.where(is_tri, color,
                         vm.scale(color, 1.0 / (4.0 * vm.PI)))
    pdf_area = jnp.where(is_tri, inv_area, 1.0)
    pdf_dir = jnp.where(is_tri, pdf_cos, pdf_sph)
    cos = jnp.where(is_tri, cos_t, 1.0)

    # make_emission_sample validity (light.impala:46-66)
    valid = (pdf_area > 0.0) & (pdf_dir > 0.0) & (cos > 0.0)
    zero = vm.splat((0.0, 0.0, 0.0), like=cos)
    intensity = vm.where(valid, intensity, zero)
    pdf_area = jnp.where(valid, pdf_area, 1.0)
    pdf_dir = jnp.where(valid, pdf_dir, 1.0)
    cos = jnp.where(valid, cos, 1.0)

    return {
        "pos": pos,
        "dir": dirv,
        "intensity": intensity,
        "pdf_area": pdf_area,
        "pdf_dir": pdf_dir,
        "cos": cos,
    }, rnd


def emission(table, light_idx, out_dir):
    """Light.emission for area lights hit by a ray (light.impala:146 via
    make_area_light:137): EmissionValue(intensity=color,
    pdf_area=inv_area, pdf_dir=cos_hemi_pdf(dot(n, dir))), black when
    pdf_dir <= 0 (make_emission_value)."""
    n = _row(table, "n", light_idx)
    color = _row(table, "color", light_idx)
    inv_area = _row(table, "inv_area", light_idx)
    is_tri = _row(table, "kind", light_idx) == TRIANGLE
    pdf_dir = vm.dot(n, out_dir) * (1.0 / vm.PI)
    valid = (pdf_dir > 0.0) & is_tri
    zero = vm.splat((0.0, 0.0, 0.0), like=pdf_dir)
    out = {
        "intensity": vm.where(valid, color, zero),
        "pdf_area": jnp.where(valid, inv_area, 1.0),
        "pdf_dir": jnp.where(valid, pdf_dir, 1.0),
        "valid": valid,
    }
    if "ke_tex" in table:
        out["ke_tex"] = _row(table, "ke_tex", light_idx)
    return out
