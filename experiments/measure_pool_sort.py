"""Per-step ray sort in the persistent renderer: measure variants on a
hall-class scene (the pool's mixed-depth slot order is the packet
kernel's worst case; the reference re-sorts every bounce,
mapping_cpu.impala:409)."""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from rodent_tpu.render import film as film_mod
from rodent_tpu.render.camera import Camera
from rodent_tpu.render.compiler import compile_mesh
from rodent_tpu.render.integrator import render_iteration_persistent
from rodent_tpu.utils import testscenes


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tris", type=int, default=50000)
    p.add_argument("--size", default="480x272")
    p.add_argument("--spp", type=int, default=2)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--variants", default="packet,packet+sort,tiled,tiled+sort")
    args = p.parse_args()
    W, H = (int(t) for t in args.size.split("x"))

    verts, idx = testscenes.make_hall(args.tris)
    scene = compile_mesh(verts, idx, max_path_len=20, emitter="inside")
    cam = Camera.make((2.5, 5.0, 5.0), (1.0, -0.12, 0.02), (0, 1, 0),
                      60.0, W, H)

    films = {}
    for var in args.variants.split(","):
        packet = "packet" in var
        sort = "sort" in var
        film = film_mod.new_film(W, H)
        film = render_iteration_persistent(scene.device, cam, film, W, H,
                                           args.spp, 0, packet=packet,
                                           sort=sort)
        jax.block_until_ready(film)
        times = []
        for it in range(1, args.iters + 1):
            t0 = time.perf_counter()
            film = render_iteration_persistent(scene.device, cam, film,
                                               W, H, args.spp, it,
                                               packet=packet, sort=sort)
            jax.block_until_ready(film)
            times.append(time.perf_counter() - t0)
        ms = np.sort(W * H * args.spp / np.asarray(times) / 1e6)
        films[var] = np.asarray(film)
        print(f"{var:14s}: {ms[len(ms) // 2]:.3f} Msamples/s "
              f"(min {ms[0]:.3f}, max {ms[-1]:.3f})", flush=True)

    ref = films.get("tiled", next(iter(films.values())))
    for var, f in films.items():
        same = np.array_equal(f, ref)
        print(f"film {var:14s} vs tiled: "
              f"{'bit-identical' if same else 'DIFFERS '
                 + str(np.abs(f - ref).max())}")


if __name__ == "__main__":
    main()
