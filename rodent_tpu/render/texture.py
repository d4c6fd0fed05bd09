"""Images and textures: border handling + filtering.

Matches src/render/image.impala: an Image is pixel data + size;
BorderHandling clamps or repeats uv (:40-54); ImageFilter picks nearest or
bilinear (:56-84); make_texture composes border o filter (:86-92).
Batched: uv is (..., 2), output (..., 3). PNG/JPG inputs are converted to
linear space with gamma 2.2 like the reference loader
(src/driver/image.cpp:10-18).

The reference's texture *descriptor* is specialized away at compile time
(bench_interface.impala measures exactly this); here border/filter are
Python-level choices baked into the jitted program the same way.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax.numpy as jnp

BORDER_CLAMP = "clamp"
BORDER_REPEAT = "repeat"
FILTER_NEAREST = "nearest"
FILTER_BILINEAR = "bilinear"


def image_from_u8(rgba, gamma=2.2):
    """u8 (H, W, C) -> linear f32 (H, W, 3) (image.cpp:10-18 applies
    gamma on load). Gray / gray+alpha inputs broadcast luma to RGB."""
    img = np.asarray(rgba, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] < 3:  # gray or gray+alpha PNG (color_type 0/4)
        img = np.repeat(img[..., :1], 3, axis=-1)
    img = img[..., :3] / 255.0
    return np.power(img, gamma).astype(np.float32)


def _apply_border(u, v, mode):
    if mode == BORDER_CLAMP:
        return jnp.clip(u, 0.0, 1.0), jnp.clip(v, 0.0, 1.0)
    if mode == BORDER_REPEAT:
        u = u - jnp.floor(u)
        v = v - jnp.floor(v)
        return u, v
    raise ValueError(mode)


def sample_texture(image, uv, border=BORDER_REPEAT, filter=FILTER_BILINEAR):
    """Samples a linear (H, W, 3) image at uv (..., 2) -> (..., 3)."""
    image = jnp.asarray(image)
    h, w = image.shape[0], image.shape[1]
    u, v = _apply_border(uv[..., 0], uv[..., 1], border)
    if filter == FILTER_NEAREST:
        # image.impala:58-63: floor to texel
        x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
        y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
        return image[y, x]
    # bilinear (image.impala:65-84): the reference's corner convention —
    # x0 = trunc(u*w) clamped, weight = frac(u*w) (no half-texel shift)
    x = u * w
    y = v * h
    x0 = jnp.minimum(x.astype(jnp.int32), w - 1)
    y0 = jnp.minimum(y.astype(jnp.int32), h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - jnp.floor(x))[..., None]
    fy = (y - jnp.floor(y))[..., None]
    c00 = image[y0, x0]
    c01 = image[y0, x1]
    c10 = image[y1, x0]
    c11 = image[y1, x1]
    return ((c00 * (1 - fx) + c01 * fx) * (1 - fy)
            + (c10 * (1 - fx) + c11 * fx) * fy)


def make_texture(image, border=BORDER_REPEAT, filter=FILTER_BILINEAR):
    """Returns uv -> color closure (make_texture, image.impala:86-92)."""
    return partial(sample_texture, image, border=border, filter=filter)


def load_texture(path, gamma=2.2):
    """Image path -> linear (H, W, 3) f32; dispatches PNG/JPEG by
    signature (device.load_png / device.load_jpg roles,
    src/driver/image.cpp + interface.cpp:584-596)."""
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"\xff\xd8":
        from ..io import jpg
        return image_from_u8(jpg.read_jpg(path), gamma)
    from ..io import png
    return image_from_u8(png.read_png(path), gamma)


def build_bank(images):
    """Stacks differently-sized textures into one padded bank for
    data-driven per-ray texture lookup (the Interface image registry role,
    src/driver/interface.cpp:456-492, made batch-friendly).

    Returns (bank (T, Hmax, Wmax, 3) f32, hw (T, 2) i32)."""
    hmax = max(im.shape[0] for im in images)
    wmax = max(im.shape[1] for im in images)
    bank = np.zeros((len(images), hmax, wmax, 3), np.float32)
    hw = np.zeros((len(images), 2), np.int32)
    for i, im in enumerate(images):
        bank[i, :im.shape[0], :im.shape[1]] = im[..., :3]
        hw[i] = (im.shape[0], im.shape[1])
    return bank, hw


def sample_bank(bank, hw, tex_id, uv, border=BORDER_REPEAT,
                filter=FILTER_BILINEAR):
    """Bilinear/nearest sample with a *per-ray* texture id.

    bank: (T, Hmax, Wmax, 3); hw: (T, 2); tex_id: (B,) int32 (negative ids
    read texture 0 — mask the result); uv: (B, 2). Returns (B, 3)."""
    T, HM, WM, _ = bank.shape
    flat = bank.reshape(T * HM * WM, 3)
    tid = jnp.maximum(tex_id, 0)
    h = hw[tid, 0]
    w = hw[tid, 1]
    u, v = _apply_border(uv[..., 0], uv[..., 1], border)

    def fetch(x, y):
        idx = tid * (HM * WM) + y * WM + x
        return flat[idx]

    if filter == FILTER_NEAREST:
        x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
        y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
        return fetch(x, y)
    x = u * w
    y = v * h
    # reference corner convention (image.impala:65-84)
    x0 = jnp.minimum(x.astype(jnp.int32), w - 1)
    y0 = jnp.minimum(y.astype(jnp.int32), h - 1)
    fx = (x - jnp.floor(x))[..., None]
    fy = (y - jnp.floor(y))[..., None]
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    c00 = fetch(x0, y0)
    c01 = fetch(x1, y0)
    c10 = fetch(x0, y1)
    c11 = fetch(x1, y1)
    return ((c00 * (1 - fx) + c01 * fx) * (1 - fy)
            + (c10 * (1 - fx) + c11 * fx) * fy)
