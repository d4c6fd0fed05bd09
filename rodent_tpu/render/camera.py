"""Perspective pinhole camera.

Matches make_perspective_camera (src/render/camera.impala:29-57) plus the
host-side basis setup in src/driver/driver.cpp:31-39: right = norm(dir x up),
up' = norm(right x dir), w = tan(fov*pi/360), h = w/aspect.
Image-plane coords (kx, ky) are in [-1, 1]^2, +ky up.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..core.math import normalize, vec3


@dataclass(frozen=True)
class Camera:
    eye: tuple
    dir: tuple
    right: tuple
    up: tuple
    w: float
    h: float

    @classmethod
    def make(cls, eye, dir, up, fov_degrees, width, height):
        eye = np.asarray(eye, np.float64)
        d = np.asarray(dir, np.float64)
        u = np.asarray(up, np.float64)
        d = d / np.linalg.norm(d)
        right = np.cross(d, u)
        right = right / np.linalg.norm(right)
        u2 = np.cross(right, d)
        u2 = u2 / np.linalg.norm(u2)
        w = float(np.tan(np.radians(fov_degrees) * 0.5))
        h = w * float(height) / float(width)  # ratio = width/height
        return cls(tuple(map(float, eye)), tuple(map(float, d)),
                   tuple(map(float, right)), tuple(map(float, u2)), w, h)

    def generate_rays(self, kx, ky):
        """(kx, ky) in [-1,1]^2 -> (org, dir) arrays; dir normalized."""
        right = vec3(*self.right)
        up = vec3(*self.up)
        d = vec3(*self.dir)
        raydir = normalize(right * (self.w * kx)[..., None]
                           + up * (self.h * ky)[..., None] + d)
        org = jnp.broadcast_to(vec3(*self.eye), raydir.shape)
        return org, raydir

    def project(self, p):
        """Projects world points (..., 3) onto the image plane
        (camera.impala:44-49): (dot(d,right)/w, dot(d,up)/h, -dot(d,dir))
        with d the normalized eye->p direction."""
        d = normalize(p - jnp.asarray(self.eye, p.dtype))
        return jnp.stack(
            [jnp.sum(d * jnp.asarray(self.right, p.dtype), -1) / self.w,
             jnp.sum(d * jnp.asarray(self.up, p.dtype), -1) / self.h,
             -jnp.sum(d * jnp.asarray(self.dir, p.dtype), -1)], axis=-1)

    def unproject(self, p):
        """camera.impala:50: a pinhole has a single aperture point — the
        unprojection of any image-plane point is the eye."""
        return jnp.broadcast_to(jnp.asarray(self.eye, jnp.float32),
                                jnp.shape(p))

    def geometry(self, kx, ky):
        """Local camera geometry at an image-plane point
        (camera.impala:51-54): dist = sqrt(1 + (x w)^2 + (y h)^2),
        cos_dir = 1/dist, area = 1/(4 w h) (pixel area relative to the
        full image plane). Used by light tracers for camera connections."""
        d = jnp.sqrt(1.0 + kx * kx * self.w * self.w
                     + ky * ky * self.h * self.h)
        return {"cos_dir": 1.0 / d, "dist": d,
                "area": jnp.broadcast_to(
                    jnp.float32(1.0 / (4.0 * self.w * self.h)),
                    jnp.shape(d))}
