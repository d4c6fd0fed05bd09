"""Batched light sampling: point lights and (precomputed) triangle lights.

Semantics follow src/render/light.impala:
- triangle lights are area lights over a uniform-triangle AreaEmitter with
  precomputed normal + inverse area (make_precomputed_triangle_light,
  :140-154), exactly the converter's no-textured-emission fast path
  (converter.cpp:771-856);
- direct sampling returns (pos, intensity, pdf_area, pdf_dir, cos) with the
  make_direct_sample validity zeroing (:81-101);
- point lights emit color/(4*pi) with pdf_area 1 (:104-120).

Lights live in SoA arrays; per-ray light choice gathers rows.
kind: 0 = point, 1 = triangle(area).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import sampling
from ..core.math import PI, dot
from ..core.rng import randf, randi

POINT, TRIANGLE = 0, 1


def build_light_table(mesh, materials_ke, light_tri_mask):
    """Extracts triangle lights from emissive-material triangles, mirroring
    converter.cpp:771-856. Returns (table dict of numpy arrays, light_ids
    per triangle — 0 for non-lights, as the reference leaves them)."""
    tri_idx = mesh.tri_indices
    num_tris = len(tri_idx)
    light_ids = np.zeros(num_tris, np.int32)
    v0s, v1s, v2s, ns, inv_areas, colors = [], [], [], [], [], []
    for t in np.nonzero(light_tri_mask)[0]:
        i0, i1, i2 = tri_idx[t]
        v0 = mesh.vertices[i0]
        v1 = mesh.vertices[i1]
        v2 = mesh.vertices[i2]
        n = np.cross(v1 - v0, v2 - v0)
        ln = np.linalg.norm(n)
        inv_area = 1.0 / (0.5 * ln)
        light_ids[t] = len(v0s)
        v0s.append(v0)
        v1s.append(v1)
        v2s.append(v2)
        ns.append(n / ln)
        inv_areas.append(inv_area)
        colors.append(materials_ke[mesh.tri_materials[t]])
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
    return {
        "kind": np.full(len(v0s), TRIANGLE, np.int32),
        "v0": np.asarray(v0s, np.float32),
        "v1": np.asarray(v1s, np.float32),
        "v2": np.asarray(v2s, np.float32),
        "n": np.asarray(ns, np.float32),
        "inv_area": np.asarray(inv_areas, np.float32),
        "color": np.asarray(colors, np.float32),
    }, light_ids


def pick_uniform(lights_n, rnd):
    """Uniform light pick like on_shadow (renderer.impala:83-85):
    (randi & 0x7FFFFFFF) % num_lights."""
    v, rnd = randi(rnd)
    return (v & 0x7FFFFFFF) % lights_n, rnd


def sample_direct(table, light_idx, rnd, from_point):
    """Light.sample_direct for a per-ray chosen light.
    Returns (dict(pos, intensity, pdf_area, pdf_dir, cos, has_area), rnd)."""
    kind = table["kind"][light_idx]
    u, rnd = randf(rnd)
    v, rnd = randf(rnd)

    # triangle area light
    v0 = table["v0"][light_idx]
    v1 = table["v1"][light_idx]
    v2 = table["v2"][light_idx]
    n = table["n"][light_idx]
    inv_area = table["inv_area"][light_idx]
    color = table["color"][light_idx]

    pos_t = sampling.sample_triangle(u, v, v0, v1, v2)
    d = from_point - pos_t
    cos_t = dot(d, n) / jnp.maximum(jnp.sqrt(dot(d, d)), 1e-30)
    pdf_dir_t = sampling.cosine_hemisphere_pdf(cos_t)

    is_tri = kind == TRIANGLE
    pos = jnp.where(is_tri[..., None], pos_t, v0)  # point light pos in v0
    intensity = jnp.where(is_tri[..., None], color,
                          color * (1.0 / (4.0 * PI)))
    pdf_area = jnp.where(is_tri, inv_area, 1.0)
    pdf_dir = jnp.where(is_tri, pdf_dir_t, sampling.uniform_sphere_pdf())
    cos = jnp.where(is_tri, cos_t, 1.0)

    # make_direct_sample validity (light.impala:81-101)
    valid = (pdf_area > 0.0) & (pdf_dir > 0.0) & (cos > 0.0)
    intensity = jnp.where(valid[..., None], intensity, 0.0)
    pdf_area = jnp.where(valid, pdf_area, 1.0)
    pdf_dir = jnp.where(valid, pdf_dir, 1.0)
    cos = jnp.where(valid, cos, 0.0)

    return {
        "pos": pos,
        "intensity": intensity,
        "pdf_area": pdf_area,
        "pdf_dir": pdf_dir,
        "cos": cos,
        "has_area": is_tri,
    }, rnd


def emission(table, light_idx, out_dir):
    """Light.emission for area lights hit by a ray (light.impala:146 via
    make_area_light:137): EmissionValue(intensity=color,
    pdf_area=inv_area, pdf_dir=cos_hemi_pdf(dot(n, dir))), black when
    pdf_dir <= 0 (make_emission_value)."""
    n = table["n"][light_idx]
    color = table["color"][light_idx]
    inv_area = table["inv_area"][light_idx]
    is_tri = table["kind"][light_idx] == TRIANGLE
    pdf_dir = sampling.cosine_hemisphere_pdf(dot(n, out_dir))
    valid = (pdf_dir > 0.0) & is_tri
    return {
        "intensity": jnp.where(valid[..., None], color, 0.0),
        "pdf_area": jnp.where(valid, inv_area, 1.0),
        "pdf_dir": jnp.where(valid, pdf_dir, 1.0),
    }
