#!/usr/bin/env python
"""On-device A/B: cornell persistent renderer, traversal engine variants.

BENCH_r03 cornell dipped 6.41 -> 5.58 Msamples/s after packet_mode began
returning "dense" for <=16-packet scenes (round-3 session 8) — the dense
engine was never timed on the chip (tunnel was down). This times one
persistent iteration per engine (dense / tiled / packet, plus the
packet-kernel refinements) at the bench config; if dense loses, it says
to gate the dense tier by backend or packet count.
"""
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rodent_tpu.io import png
from rodent_tpu.render import film as film_mod
from rodent_tpu.render.camera import Camera
from rodent_tpu.render.compiler import compile_obj
from rodent_tpu.render.integrator import render_iteration_persistent


def main():
    ref = png.read_png("/root/reference/testing/ref-cornell.png")[..., :3]
    H0, W0 = ref.shape[:2]
    spp, iters = 4, 8
    scene = compile_obj("/root/reference/testing/cornell_box.obj",
                        max_path_len=64)
    cam = Camera.make((0, 1, 2.7), (0, 0, -1), (0, 1, 0), 60.0, W0, H0)
    total = W0 * H0 * spp
    print(f"cornell {W0}x{H0} spp{spp} backend={jax.default_backend()}")

    variants = [("dense", dict(packet="dense")),
                ("tiled", dict(packet=False)),
                ("packet", dict(packet=True)),
                ("packet+retire2", dict(packet=True, retire_every=2)),
                ("packet pool16K", dict(packet=True, pool=1 << 14)),
                ("packet pool64K", dict(packet=True, pool=1 << 16)),
                ("packet sortpool", dict(packet=True, sort="pool")),
                ("packet 64K r2", dict(packet=True, pool=1 << 16,
                                       retire_every=2))]
    for name, kw in variants:
        try:
            film = film_mod.new_film(W0, H0)
            film = render_iteration_persistent(scene.device, cam, film,
                                               W0, H0, spp, 0, **kw)
            _ = np.asarray(film[:1])
            t0 = time.perf_counter()
            for it in range(1, iters):
                film = render_iteration_persistent(
                    scene.device, cam, film, W0, H0, spp, it, **kw)
            _ = np.asarray(film[:1])
            dt = (time.perf_counter() - t0) / (iters - 1)
            print(f"{name:16s} {dt*1e3:7.1f} ms/iter "
                  f"({total/dt/1e6:5.2f} Msamples/s)")
        except Exception as e:
            print(f"{name:16s} FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
