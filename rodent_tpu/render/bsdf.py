"""Data-driven, batched BSDF layer (component-leading layout).

The reference builds one specialized closure per material
(src/render/material.impala) and dispatches per geometry; its megakernel
mode additionally fuses all "simple" materials into one data-driven shader
(src/driver/converter.cpp:683-709). On TPU the fused form is the native
one: every ray carries its material *parameters* (selected by geometry id)
plus a small `kind` code, and eval/pdf/sample are computed for all kinds
with masks — there are only a handful of kinds, so this is a few fused VPU
ops rather than divergent control flow.

Layout: colors/directions are Vec3 tuples of full-tile arrays (see
core.vmath); scalars are plain arrays. This keeps the whole shading stage
at full VPU lane utilization (the (B, 3) form wasted 127/128 lanes).

Kinds:
  0 BLACK   fully absorbing (make_black_bsdf, material.impala:75-83)
  1 DIFFUSE Lambert (make_diffuse_bsdf, :85-100)
  2 PHONG   physically-correct Phong (make_phong_bsdf, :103-123)
  3 MIRROR  perfect mirror (make_mirror_bsdf, :126-135)
  4 GLASS   Fresnel reflection/refraction (make_glass_bsdf, :138-163)
  5 MIX     lerp(diffuse, phong, k) importance-sampled
            (make_mix_bsdf, :166-192; k = lum_ks/(lum_ks+lum_kd) as in
            converter.cpp:905-911)

Conventions follow the reference exactly: out_dir points away from the
surface toward the viewer (= -ray.dir), in_dir is the light/bounce
direction; "local" is the shading-normal ONB; validity of samples is
checked against the *face* normal (make_bsdf_sample, material.impala:63-74).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import vmath as vm
from ..core.rng import randf
from ..core.sampling import (cosine_hemisphere_pdf,
                             cosine_power_hemisphere_pdf,
                             sample_cosine_hemisphere_c,
                             sample_cosine_power_hemisphere_c)

BLACK, DIFFUSE, PHONG, MIRROR, GLASS, MIX = 0, 1, 2, 3, 4, 5


def positive_cos(a, b):
    return jnp.maximum(vm.dot(a, b), 0.0)


def is_specular(mat):
    return (mat["kind"] == MIRROR) | (mat["kind"] == GLASS)


def _diffuse_eval(mat):
    return vm.scale(mat["kd"], 1.0 / vm.PI)


def _phong_eval_pdf(mat, surf, in_dir, out_dir):
    refl = vm.reflect(out_dir, surf["n"])
    cos = positive_cos(in_dir, refl)
    ns = mat["ns"]
    e = vm.scale(mat["ks"], jnp.power(cos, ns) * (ns + 2.0)
                 * (1.0 / (2.0 * vm.PI)))
    return e, cosine_power_hemisphere_pdf(cos, ns)


def eval_pdf(mat, surf, in_dir, out_dir):
    """Returns (color Vec3, pdf) of the BSDF for in/out directions."""
    kind = mat["kind"]
    cos_n = positive_cos(in_dir, surf["n"])

    d_e = _diffuse_eval(mat)
    d_pdf = cosine_hemisphere_pdf(cos_n)
    p_e, p_pdf = _phong_eval_pdf(mat, surf, in_dir, out_dir)
    k = mat["mix_k"]

    zero = vm.splat((0.0, 0.0, 0.0), like=cos_n)
    color = vm.where(kind == DIFFUSE, d_e,
            vm.where(kind == PHONG, p_e,
            vm.where(kind == MIX, vm.lerp(d_e, p_e, k), zero)))
    pdf = jnp.where(kind == DIFFUSE, d_pdf,
          jnp.where(kind == PHONG, p_pdf,
          jnp.where(kind == MIX, d_pdf + (p_pdf - d_pdf) * k, 0.0)))
    return color, pdf


def _validate(surf, in_dir, pdf, color, inverted):
    """make_bsdf_sample's right-side-of-surface check
    (material.impala:63-74): invalid -> pdf 1, color black."""
    above = vm.dot(in_dir, surf["face_normal"]) > 0.0
    valid = (pdf > 0.0) & (inverted ^ above)
    zero = vm.splat((0.0, 0.0, 0.0), like=pdf)
    return jnp.where(valid, pdf, 1.0), vm.where(valid, color, zero)


def sample(mat, surf, rnd, out_dir):
    """Samples all kinds with masks; a fixed 3 uniforms are drawn per ray
    so RNG state threading is batch-uniform (the per-material draw count
    of the reference only changes the noise pattern, not the estimator).

    Returns (in_dir Vec3, pdf, cos, color Vec3, rnd)."""
    kind = mat["kind"]
    n = surf["n"]
    t_, b_ = surf["t"], surf["b"]

    u0, rnd = randf(rnd)  # mix lobe selector / glass fresnel selector
    u1, rnd = randf(rnd)
    u2, rnd = randf(rnd)
    falsem = jnp.zeros_like(u0, bool)

    # --- diffuse: cosine hemisphere in the shading frame ---
    d_local, d_pdf = sample_cosine_hemisphere_c(u1, u2)
    d_dir = vm.basis_mul(t_, b_, n, d_local)
    d_cos = d_local[2]
    d_color = _diffuse_eval(mat)
    d_pdf, d_color = _validate(surf, d_dir, d_pdf, d_color, falsem)

    # --- phong: cosine-power lobe around the reflection direction ---
    ns = mat["ns"]
    refl = vm.reflect(out_dir, n)
    p_local, p_pdf = sample_cosine_power_hemisphere_c(ns, u1, u2)
    rt, rb, rn = vm.onb(refl)
    p_dir = vm.basis_mul(rt, rb, rn, p_local)
    p_cos = positive_cos(p_dir, n)
    p_color = vm.scale(mat["ks"], p_pdf * (ns + 2.0) / (ns + 1.0))
    p_pdf_v, p_color = _validate(surf, p_dir, p_pdf, p_color, falsem)

    # --- mirror ---
    m_dir = refl
    m_pdf = jnp.ones_like(d_pdf)
    m_pdf, m_color = _validate(surf, m_dir, m_pdf, mat["ks"], falsem)

    # --- glass (adjoint=false as in the path tracer) ---
    k_ior = jnp.where(surf["is_entering"], 1.0 / mat["ni"], mat["ni"])
    cos_i = vm.dot(out_dir, n)
    cos2_t = 1.0 - k_ior * k_ior * (1.0 - cos_i * cos_i)
    cos_t = jnp.sqrt(jnp.maximum(cos2_t, 0.0))
    f_s = (k_ior * cos_i - cos_t) / jnp.maximum(k_ior * cos_i + cos_t, 1e-30)
    f_p = (cos_i - k_ior * cos_t) / jnp.maximum(cos_i + k_ior * cos_t, 1e-30)
    fresnel = 0.5 * (f_s * f_s + f_p * f_p)
    refr_dir = vm.sub(vm.scale(n, k_ior * cos_i - cos_t),
                      vm.scale(out_dir, k_ior))
    refract = (cos2_t > 0.0) & (u0 > fresnel)
    g_dir = vm.where(refract, refr_dir, refl)
    g_pdf = jnp.ones_like(d_pdf)
    g_color = vm.where(refract, mat["tf"], mat["ks"])
    g_pdf, g_color = _validate(surf, g_dir, g_pdf, g_color, refract)

    # --- mix(diffuse, phong, k): pick a lobe, combine pdfs/colors ---
    k = mat["mix_k"]
    pick_phong = u0 < k  # reference: randf >= k -> mat1 (diffuse)
    x_dir = vm.where(pick_phong, p_dir, d_dir)
    x_cos = jnp.where(pick_phong, p_cos, d_cos)
    de = _diffuse_eval(mat)
    dp = cosine_hemisphere_pdf(positive_cos(x_dir, n))
    pe, pp = _phong_eval_pdf(mat, surf, x_dir, out_dir)
    chosen_color = vm.where(pick_phong, p_color, d_color)
    chosen_pdf = jnp.where(pick_phong, p_pdf_v, d_pdf)
    other_color = vm.where(pick_phong, de, pe)
    other_pdf = jnp.where(pick_phong, dp, pp)
    x_color = vm.where(pick_phong,
                       vm.lerp(other_color, chosen_color, k),
                       vm.lerp(chosen_color, other_color, k))
    x_pdf = jnp.where(pick_phong,
                      other_pdf + (chosen_pdf - other_pdf) * k,
                      chosen_pdf + (other_pdf - chosen_pdf) * k)

    in_dir = vm.where(kind == DIFFUSE, d_dir,
             vm.where(kind == PHONG, p_dir,
             vm.where(kind == MIRROR, m_dir,
             vm.where(kind == GLASS, g_dir,
             vm.where(kind == MIX, x_dir, out_dir)))))
    pdf = jnp.where(kind == DIFFUSE, d_pdf,
          jnp.where(kind == PHONG, p_pdf_v,
          jnp.where(kind == MIRROR, m_pdf,
          jnp.where(kind == GLASS, g_pdf,
          jnp.where(kind == MIX, x_pdf, 1.0)))))
    cos = jnp.where(kind == DIFFUSE, d_cos,
          jnp.where(kind == PHONG, p_cos,
          jnp.where(kind == MIRROR, 1.0,
          jnp.where(kind == GLASS, 1.0,
          jnp.where(kind == MIX, x_cos, 1.0)))))
    zero = vm.splat((0.0, 0.0, 0.0), like=pdf)
    color = vm.where(kind == DIFFUSE, d_color,
            vm.where(kind == PHONG, p_color,
            vm.where(kind == MIRROR, m_color,
            vm.where(kind == GLASS, g_color,
            vm.where(kind == MIX, x_color, zero)))))
    return in_dir, pdf, cos, color, rnd
