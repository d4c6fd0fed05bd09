"""Data-driven, batched BSDF layer.

The reference builds one specialized closure per material
(src/render/material.impala) and dispatches per geometry; its megakernel
mode additionally fuses all "simple" materials into one data-driven shader
(src/driver/converter.cpp:683-709). On TPU the fused form is the native
one: every ray carries its material *parameters* (gathered by geometry id)
plus a small `kind` code, and eval/pdf/sample are computed for all kinds
with masks — there are only a handful of kinds, so this is a few fused VPU
ops rather than divergent control flow.

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

from ..core import sampling
from ..core.math import basis_mul, dot, lerp, reflect, vec3
from ..core.rng import randf

BLACK, DIFFUSE, PHONG, MIRROR, GLASS, MIX = 0, 1, 2, 3, 4, 5


def positive_cos(a, b):
    return jnp.maximum(dot(a, b), 0.0)


def is_specular(mat):
    return (mat["kind"] == MIRROR) | (mat["kind"] == GLASS)


def _diffuse_eval(mat):
    return mat["kd"] * (1.0 / jnp.pi)


def _phong_eval_pdf(mat, surf, in_dir, out_dir):
    refl = reflect(out_dir, surf["n"])
    cos = positive_cos(in_dir, refl)
    ns = mat["ns"]
    e = mat["ks"] * (jnp.power(cos, ns) * (ns + 2.0)
                     * (1.0 / (2.0 * jnp.pi)))[..., None]
    pdf = sampling.cosine_power_hemisphere_pdf(cos, ns)
    return e, pdf


def eval_pdf(mat, surf, in_dir, out_dir):
    """Returns (color (B,3), pdf (B,)) of the BSDF for in/out directions."""
    kind = mat["kind"]
    n = surf["n"]
    cos_n = positive_cos(in_dir, n)

    d_e = _diffuse_eval(mat)
    d_pdf = sampling.cosine_hemisphere_pdf(cos_n)
    p_e, p_pdf = _phong_eval_pdf(mat, surf, in_dir, out_dir)
    k = mat["mix_k"][..., None]

    color = jnp.where(kind[..., None] == DIFFUSE, d_e,
            jnp.where(kind[..., None] == PHONG, p_e,
            jnp.where(kind[..., None] == MIX,
                      lerp(d_e, p_e, k), 0.0)))
    pdf = jnp.where(kind == DIFFUSE, d_pdf,
          jnp.where(kind == PHONG, p_pdf,
          jnp.where(kind == MIX, lerp(d_pdf, p_pdf, mat["mix_k"]), 0.0)))
    return color, pdf


def _validate(surf, in_dir, pdf, color, inverted):
    """make_bsdf_sample's right-side-of-surface check
    (material.impala:63-74): invalid -> pdf 1, color black."""
    above = dot(in_dir, surf["face_normal"]) > 0.0
    valid = (pdf > 0.0) & (inverted ^ above)
    return (jnp.where(valid, pdf, 1.0),
            jnp.where(valid[..., None], color, 0.0))


def sample(mat, surf, rnd, out_dir):
    """Samples all kinds with masks; a fixed 3 uniforms are drawn per ray
    so RNG state threading is batch-uniform (the per-material draw count
    of the reference only changes the noise pattern, not the estimator).

    Returns (in_dir, pdf, cos, color, rnd)."""
    kind = mat["kind"]
    n = surf["n"]
    t_, b_, _ = surf["t"], surf["b"], n

    u0, rnd = randf(rnd)  # mix lobe selector / glass fresnel selector
    u1, rnd = randf(rnd)
    u2, rnd = randf(rnd)

    # --- diffuse: cosine hemisphere in the shading frame ---
    d_local, d_pdf = sampling.sample_cosine_hemisphere(u1, u2)
    d_dir = basis_mul(t_, b_, n, d_local)
    d_cos = d_local[..., 2]
    d_color = _diffuse_eval(mat)
    d_pdf, d_color = _validate(surf, d_dir, d_pdf, d_color,
                               jnp.zeros_like(d_pdf, bool))

    # --- phong: cosine-power lobe around the reflection direction ---
    refl = reflect(out_dir, n)
    p_local, p_pdf = sampling.sample_cosine_power_hemisphere(mat["ns"], u1, u2)
    rt, rb, rn = _onb(refl)
    p_dir = basis_mul(rt, rb, rn, p_local)
    p_cos = positive_cos(p_dir, n)
    p_color = mat["ks"] * (p_pdf * (mat["ns"] + 2.0)
                           / (mat["ns"] + 1.0))[..., None]
    p_pdf_v, p_color = _validate(surf, p_dir, p_pdf, p_color,
                                 jnp.zeros_like(p_pdf, bool))

    # --- mirror ---
    m_dir = refl
    m_pdf = jnp.ones_like(d_pdf)
    m_color = mat["ks"]
    m_pdf, m_color = _validate(surf, m_dir, m_pdf, m_color,
                               jnp.zeros_like(d_pdf, bool))

    # --- glass (adjoint=false as in the path tracer) ---
    k_ior = jnp.where(surf["is_entering"], 1.0 / mat["ni"], mat["ni"])
    cos_i = dot(out_dir, n)
    cos2_t = 1.0 - k_ior * k_ior * (1.0 - cos_i * cos_i)
    cos_t = jnp.sqrt(jnp.maximum(cos2_t, 0.0))
    f_s = (k_ior * cos_i - cos_t) / jnp.maximum(k_ior * cos_i + cos_t, 1e-30)
    f_p = (cos_i - k_ior * cos_t) / jnp.maximum(cos_i + k_ior * cos_t, 1e-30)
    fresnel = 0.5 * (f_s * f_s + f_p * f_p)
    refr_dir = (n * (k_ior * cos_i - cos_t)[..., None]
                - out_dir * k_ior[..., None])
    refract = (cos2_t > 0.0) & (u0 > fresnel)
    g_dir = jnp.where(refract[..., None], refr_dir, refl)
    g_pdf = jnp.ones_like(d_pdf)
    g_color = jnp.where(refract[..., None], mat["tf"], mat["ks"])
    g_pdf, g_color = _validate(surf, g_dir, g_pdf, g_color, refract)

    # --- mix(diffuse, phong, k): pick a lobe, combine pdfs/colors ---
    k = mat["mix_k"]
    pick_phong = u0 < k  # reference: randf >= k -> mat1 (diffuse)
    x_dir = jnp.where(pick_phong[..., None], p_dir, d_dir)
    x_cos = jnp.where(pick_phong, p_cos, d_cos)
    # re-evaluate the other lobe at the sampled direction
    de = _diffuse_eval(mat)
    dp = sampling.cosine_hemisphere_pdf(positive_cos(x_dir, n))
    pe, pp = _phong_eval_pdf(mat, surf, x_dir, out_dir)
    # chosen lobe's sample color; other lobe's eval
    chosen_color = jnp.where(pick_phong[..., None], p_color, d_color)
    chosen_pdf = jnp.where(pick_phong, p_pdf_v, d_pdf)
    other_color = jnp.where(pick_phong[..., None], de, pe)
    other_pdf = jnp.where(pick_phong, dp, pp)
    x_color = jnp.where(pick_phong[..., None],
                        lerp(other_color, chosen_color, k[..., None]),
                        lerp(chosen_color, other_color, k[..., None]))
    x_pdf = jnp.where(pick_phong, lerp(other_pdf, chosen_pdf, k),
                      lerp(chosen_pdf, other_pdf, k))

    kindc = kind[..., None]
    in_dir = jnp.where(kindc == DIFFUSE, d_dir,
             jnp.where(kindc == PHONG, p_dir,
             jnp.where(kindc == MIRROR, m_dir,
             jnp.where(kindc == GLASS, g_dir,
             jnp.where(kindc == MIX, x_dir, out_dir)))))
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
    color = jnp.where(kindc == DIFFUSE, d_color,
            jnp.where(kindc == PHONG, p_color,
            jnp.where(kindc == MIRROR, m_color,
            jnp.where(kindc == GLASS, g_color,
            jnp.where(kindc == MIX, x_color, 0.0)))))
    return in_dir, pdf, cos, color, rnd


def _onb(n):
    from ..core.math import make_orthonormal_basis
    return make_orthonormal_basis(n)
