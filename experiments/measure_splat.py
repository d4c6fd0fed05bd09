"""Time the cornell persistent renderer (bench.py config) — used to A/B
the planar-film splat (3 x 1D scatter-adds vs one (pool, 3) row scatter).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp

from rodent_tpu.io import png
from rodent_tpu.render import film as film_mod
from rodent_tpu.render.camera import Camera
from rodent_tpu.render.compiler import compile_obj, packet_ok
from rodent_tpu.render.integrator import render_iteration_persistent

ref = png.read_png("/root/reference/testing/ref-cornell.png")[..., :3]
H0, W0 = ref.shape[:2]
spp = 4
iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
scene = compile_obj("/root/reference/testing/cornell_box.obj",
                    max_path_len=64)
packet = packet_ok(scene.device) and jax.default_backend() == "tpu"
cam = Camera.make((0, 1, 2.7), (0, 0, -1), (0, 1, 0), 60.0, W0, H0)
film = film_mod.new_film(W0, H0)
film = render_iteration_persistent(scene.device, cam, film, W0, H0, spp,
                                   0, packet=packet)
jax.block_until_ready(film)
t0 = time.perf_counter()
for it in range(1, iters):
    film = render_iteration_persistent(scene.device, cam, film, W0, H0,
                                       spp, it, packet=packet)
jax.block_until_ready(film)
dt = time.perf_counter() - t0
ms = W0 * H0 * spp * (iters - 1) / dt / 1e6
print(f"cornell {W0}x{H0} spp{spp}: {dt/(iters-1)*1e3:.1f} ms/iter "
      f"({ms:.2f} Msamples/s) over {iters-1} iters")
img = film_mod.tonemap(film, W0, H0, iters)
print(f"MSE vs ref at {iters} iters: {film_mod.mse_u8(ref, img):.2f}")
