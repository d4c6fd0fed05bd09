"""Counter-free batched RNG matching the reference's xorshift32 + FNV scheme.

The reference threads a 32-bit RndState through each path
(src/core/random.impala). We keep the exact same generator, vectorized over
uint32 arrays, so renders are deterministic and reproducible the same way:
per-(sample, iter, x, y) FNV-seeded streams (src/render/renderer.impala:26-40).

All functions are pure: they take a uint32 state array and return
(value, new_state).
"""
from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32


def xorshift(state):
    """32-bit xorshift (random.impala:22-30). Returns new state (= value)."""
    x = jnp.where(state == 0, U32(1), state)
    x = x ^ (x << 13)
    x = x ^ (x >> 17)
    x = x ^ (x << 5)
    return x


def randi(state):
    """Random int32 (bit pattern of the new state). Returns (value, state)."""
    s = xorshift(state)
    return s.astype(jnp.int32), s


def randf(state):
    """Uniform float in [0, 1) via mantissa bit-trick (random.impala:7-11)."""
    s = xorshift(state)
    bits = (U32(127 << 23) | (s & U32(0x7FFFFF)))
    return bits.view(jnp.float32) - 1.0, s


def fnv_init():
    return U32(0x811C9DC5)


def fnv_hash(h, d):
    """FNV-1a-style 32-bit hash over the 4 bytes of d (random.impala:116-122)."""
    d = jnp.asarray(d).astype(U32)
    prime = U32(16777619)
    h = (h * prime) ^ (d & U32(0xFF))
    h = (h * prime) ^ ((d >> 8) & U32(0xFF))
    h = (h * prime) ^ ((d >> 16) & U32(0xFF))
    h = (h * prime) ^ ((d >> 24) & U32(0xFF))
    return h


def bernstein_init():
    return U32(5381)


def bernstein_hash(h, d):
    """Bernstein hash over the 4 bytes of d (random.impala:107-112)."""
    d = jnp.asarray(d).astype(U32)
    h = (h * U32(33)) ^ (d & U32(0xFF))
    h = (h * U32(33)) ^ ((d >> 8) & U32(0xFF))
    h = (h * U32(33)) ^ ((d >> 16) & U32(0xFF))
    h = (h * U32(33)) ^ ((d >> 24) & U32(0xFF))
    return h


def seed_camera_rays(sample, iteration, x, y):
    """Per-pixel/sample RNG seed exactly as make_camera_emitter
    (renderer.impala:27-33): FNV over (sample, iter, x, y)."""
    h = fnv_hash(jnp.broadcast_to(fnv_init(), jnp.shape(x)), sample)
    h = fnv_hash(h, iteration)
    h = fnv_hash(h, x)
    h = fnv_hash(h, y)
    return h
