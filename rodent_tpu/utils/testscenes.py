"""Procedural benchmark scenes.

The reference benchmarks on Sponza / Crown / San-Miguel meshes that are
not redistributable and not checked in (SURVEY.md §4: sponza.bvh /
sponza-primary.rays must be regenerated from an OBJ). With zero network
egress we instead generate a deterministic "hall" scene of comparable
structure to Sponza: an enclosed rectangular atrium with columns, arches
and a displaced floor, tessellated to a target triangle count. Primary
rays from a camera inside the hall produce a similar traversal profile
(moderate depth, high coherence) to the sponza-primary workload.
"""
from __future__ import annotations

import numpy as np


def _grid_patch(nx, ny, corner, du, dv, displace=None, mat=0):
    """Tessellated quad patch: corner + u*du + v*dv (+ displacement)."""
    u = np.linspace(0.0, 1.0, nx + 1)
    v = np.linspace(0.0, 1.0, ny + 1)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    pts = (np.asarray(corner)[None, None]
           + uu[..., None] * np.asarray(du)[None, None]
           + vv[..., None] * np.asarray(dv)[None, None])
    if displace is not None:
        pts = pts + displace(uu, vv)
    verts = pts.reshape(-1, 3)
    idx = []
    for i in range(nx):
        for j in range(ny):
            a = i * (ny + 1) + j
            b = (i + 1) * (ny + 1) + j
            idx.append((a, b, a + 1, mat))
            idx.append((a + 1, b, b + 1, mat))
    return verts.astype(np.float32), np.asarray(idx, np.int32)


def _cylinder(center, radius, height, segments, rings, mat=1):
    """Open cylinder (column)."""
    ang = np.linspace(0, 2 * np.pi, segments + 1)
    hs = np.linspace(0, height, rings + 1)
    verts = []
    for h in hs:
        for a in ang:
            verts.append((center[0] + radius * np.cos(a), center[1] + h,
                          center[2] + radius * np.sin(a)))
    verts = np.asarray(verts, np.float32)
    idx = []
    n = segments + 1
    for r in range(rings):
        for s in range(segments):
            a = r * n + s
            b = (r + 1) * n + s
            idx.append((a, b, a + 1, mat))
            idx.append((a + 1, b, b + 1, mat))
    return verts, np.asarray(idx, np.int32)


def make_hall(target_tris=260_000, seed=7):
    """Sponza-class atrium: walls/floor/ceiling patches with sinusoidal
    relief + a grid of columns. Returns (vertices (V,3) f32,
    indices (T*4,) i32) with ~target_tris triangles."""
    rng = np.random.RandomState(seed)
    # budget: ~55% surfaces, ~45% columns
    patches = []
    W, H, D = 24.0, 12.0, 10.0  # hall extents

    def relief(amp, fx, fy, axis):
        def f(uu, vv):
            d = amp * np.sin(fx * np.pi * uu) * np.cos(fy * np.pi * vv)
            out = np.zeros(uu.shape + (3,), np.float32)
            out[..., axis] = d
            return out
        return f

    surf_tris = int(target_tris * 0.55)
    per_patch = surf_tris // 6
    n = max(int(np.sqrt(per_patch / 2)), 2)
    specs = [
        # floor, ceiling (displaced in y)
        ((0, 0, 0), (W, 0, 0), (0, 0, D), relief(0.15, 9, 7, 1), 0),
        ((0, H, 0), (W, 0, 0), (0, 0, D), relief(0.1, 5, 6, 1), 0),
        # long walls (displaced in z)
        ((0, 0, 0), (W, 0, 0), (0, H, 0), relief(0.2, 11, 5, 2), 2),
        ((0, 0, D), (W, 0, 0), (0, H, 0), relief(0.2, 8, 6, 2), 2),
        # end walls (displaced in x)
        ((0, 0, 0), (0, 0, D), (0, H, 0), relief(0.2, 6, 6, 0), 3),
        ((W, 0, 0), (0, 0, D), (0, H, 0), relief(0.2, 7, 5, 0), 3),
    ]
    all_v, all_i = [], []
    voff = 0
    for corner, du, dv, disp, mat in specs:
        v, i = _grid_patch(n, n, corner, du, dv, disp, mat)
        i[:, :3] += voff
        voff += len(v)
        all_v.append(v)
        all_i.append(i)

    col_tris = target_tris - sum(len(i) for i in all_i)
    cols_x, cols_z = 8, 3
    n_cols = cols_x * cols_z
    per_col = max(col_tris // n_cols, 16)
    segments = max(int(np.sqrt(per_col / 2)), 4)
    rings = max(per_col // (2 * segments), 2)
    for ix in range(cols_x):
        for iz in range(cols_z):
            cx = W * (ix + 0.5) / cols_x + rng.uniform(-0.3, 0.3)
            cz = D * (iz + 0.5) / cols_z + rng.uniform(-0.3, 0.3)
            v, i = _cylinder((cx, 0.0, cz), 0.45 + rng.uniform(0, 0.15),
                             H * 0.85, segments, rings, mat=1)
            i[:, :3] += voff
            voff += len(v)
            all_v.append(v)
            all_i.append(i)

    verts = np.concatenate(all_v)
    idx = np.concatenate(all_i)
    return verts, idx.reshape(-1)


def hall_primary_rays(width=1024, height=1024):
    """Primary rays from inside the hall looking down its length —
    the sponza-primary analog (tools/ray_gen primary distribution)."""
    eye = np.asarray([2.5, 5.0, 5.0], np.float32)
    dirv = np.asarray([1.0, -0.12, 0.02], np.float32)
    up = np.asarray([0.0, 1.0, 0.0], np.float32)
    d = dirv / np.linalg.norm(dirv)
    right = np.cross(d, up)
    right /= np.linalg.norm(right)
    u2 = np.cross(right, d)
    scale = np.tan(np.radians(60.0) / 2)
    xs = (np.arange(width) + 0.5) / width * 2 - 1
    ys = 1 - (np.arange(height) + 0.5) / height * 2
    kx, ky = np.meshgrid(xs, ys)
    dirs = (d[None, None] + kx[..., None] * scale * right[None, None]
            + ky[..., None] * (scale * height / width) * u2[None, None])
    dirs = dirs.reshape(-1, 3).astype(np.float32)
    org = np.tile(eye[None], (len(dirs), 1))
    return org, dirs


def hall_secondary_rays(kind, hit_org, hit_n, seed=11, ao_tmax=10.0):
    """Secondary-ray distributions from primary hit points, mirroring the
    reference's benchmark distributions (tools/ray_gen.cpp): "ao" =
    short any-hit rays, "bounces" = diffuse (cosine-hemisphere) bounce
    rays — the incoherent workload.

    hit_org (N, 3), hit_n (N, 3) come from a primary-ray trace. Returns
    (org, dir, tmax)."""
    r = np.random.RandomState(seed)
    n = len(hit_org)
    u1 = r.uniform(size=n).astype(np.float32)
    u2 = r.uniform(size=n).astype(np.float32)
    # cosine-weighted hemisphere around the normal
    phi = 2.0 * np.pi * u1
    st = np.sqrt(u2)
    local = np.stack([np.cos(phi) * st, np.sin(phi) * st,
                      np.sqrt(np.maximum(1.0 - u2, 0.0))], axis=1)
    # ONB per hit
    nz = hit_n / np.maximum(np.linalg.norm(hit_n, axis=1, keepdims=True),
                            1e-20)
    h = np.where(np.abs(nz[:, 0:1]) > 0.9, [[0.0, 1.0, 0.0]],
                 [[1.0, 0.0, 0.0]]).astype(np.float32)
    t = np.cross(h, nz)
    t /= np.maximum(np.linalg.norm(t, axis=1, keepdims=True), 1e-20)
    b = np.cross(nz, t)
    d = (local[:, 0:1] * t + local[:, 1:2] * b + local[:, 2:3] * nz)
    org = (hit_org + 1e-3 * nz).astype(np.float32)
    tmax = np.full(n, ao_tmax if kind == "ao" else 3.402823466e38,
                   np.float32)
    return org, d.astype(np.float32), tmax
