"""Film accumulation and tonemapping.

The reference keeps a running radiance sum per pixel and divides by the
iteration count at display time with gamma 1/2.2 (src/driver/driver.cpp
update_texture/save_image:118-162). Same here; the film is a flat
(H*W, 3) float32 array so scatter-adds from the wavefront loop are cheap.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def new_film(width, height):
    return jnp.zeros((width * height, 3), jnp.float32)


def splat(film, pixel_ids, color, mask=None):
    """Scatter-add radiance into the film."""
    if mask is not None:
        color = jnp.where(mask[:, None], color, 0.0)
    return film.at[pixel_ids].add(color, mode="drop")


def tonemap(film, width, height, iters):
    """Running sum -> gamma-2.2 u8 image (H, W, 3), like save_image."""
    img = np.asarray(film, np.float32).reshape(height, width, 3)
    img = np.power(np.clip(img / float(iters), 0.0, None), 1.0 / 2.2)
    return (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)


def mse_u8(a, b):
    """Mean squared error over u8 images, the CTest pass metric
    (cmake/test/run_rodent.cmake uses ImageMagick MSE)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.mean((a - b) ** 2))
