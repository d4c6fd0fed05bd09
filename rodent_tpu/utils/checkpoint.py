"""Checkpoint / resume + build-artifact caching.

The reference has no render-state checkpointing; its nearest mechanisms
are (a) progressive film accumulation divided by the iteration count at
display time (src/driver/driver.cpp:118-135) and (b) the BVH stamp cache
that skips rebuilds when (target, scene) are unchanged
(src/driver/converter.cpp:559-573) plus per-device path->array registries
(src/driver/interface.cpp:392-414). SURVEY.md §5 asks for both to be
first-class here:

- render checkpoints persist the film sum + iteration count (+ arbitrary
  metadata) so progressive renders resume exactly;
- the BVH cache keys built acceleration structures on a content hash of
  (vertices, indices, arity, packet), the stamp-file idea made robust.
"""
from __future__ import annotations

import hashlib
import json
import os

import numpy as np


def save_render_checkpoint(path, film, iteration, **meta):
    """Persists the running film sum and iteration counter."""
    np.savez_compressed(path, film=np.asarray(film, np.float32),
                        iteration=np.int64(iteration),
                        meta=json.dumps(meta))


def load_render_checkpoint(path):
    """Returns (film (N,3) f32, iteration int, meta dict)."""
    with np.load(path, allow_pickle=False) as z:
        film = z["film"]
        iteration = int(z["iteration"])
        meta = json.loads(str(z["meta"]))
    return film, iteration, meta


def _mesh_key(vertices, indices, arity, packet):
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(vertices, np.float32).tobytes())
    h.update(np.ascontiguousarray(indices, np.int32).tobytes())
    h.update(f"a{arity}p{packet}v1".encode())
    return h.hexdigest()[:24]


def build_bvh_cached(vertices, indices, arity=8, packet=4,
                     cache_dir=".rodent_cache"):
    """build_bvh with a content-addressed on-disk cache (the bvh.stamp
    mechanism, but keyed on actual geometry bytes)."""
    from ..accel import build_bvh
    from ..accel.layout import WideBvh
    from ..io import formats

    key = _mesh_key(vertices, indices, arity, packet)
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"bvh_{key}.bvh")
    btype = {(2, 1): formats.BVH2_TRI1, (4, 4): formats.BVH4_TRI4,
             (8, 4): formats.BVH8_TRI4}[(arity, packet)]
    if os.path.exists(path):
        try:
            return WideBvh.from_block(formats.read_bvh(path, btype))
        except (ValueError, KeyError, OSError):
            pass  # corrupt cache entry: rebuild
    bvh = build_bvh(vertices, indices, arity=arity, packet=packet)
    tmp = path + ".tmp"
    formats.write_bvh(tmp, bvh.to_block())
    os.replace(tmp, path)
    return bvh
