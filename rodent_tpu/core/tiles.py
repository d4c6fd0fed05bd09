"""(R, 128) tile-layout helpers shared by traversal and shading.

B batch elements live as (R, 128) arrays (R = ceil(B/128)); see
traversal/tiled.py for why this layout is mandatory on TPU.
"""
from __future__ import annotations

import jax.numpy as jnp


def num_tiles(b):
    return -(-b // 128)


def tile(x, r=None):
    """(B, ...) -> (R, 128): pads with zeros."""
    b = x.shape[0]
    r = r or num_tiles(b)
    pad = r * 128 - b
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x.reshape((r, 128) + x.shape[1:])


def untile(x, b):
    """(R, 128, ...) -> (B, ...)."""
    return x.reshape((x.shape[0] * 128,) + x.shape[2:])[:b]


def pad_mask(b, r=None):
    """True for real elements, False for padding."""
    r = r or num_tiles(b)
    return tile(jnp.ones(b, jnp.int32), r) == 1


def gather_cols(table, idx):
    """Flat row gather + relayout to component-major.

    table: (N, C); idx: (R, 128) int32. Returns (C, R, 128) so each
    component is a full-tile slice (single efficient gather + one
    transpose; per-component gathers or multi-dim rows are 100x slower)."""
    r = idx.shape[0]
    rows = table[idx.reshape(r * 128)]
    return rows.T.reshape(table.shape[1], r, 128)
