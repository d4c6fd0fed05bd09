"""Textured-material rendering: a checkerboard map_Kd wall must show the
pattern in the render (the reference's textured-shader path,
converter.cpp:877-886 + image.impala textures)."""
import numpy as np

from rodent_tpu.io import png
from rodent_tpu.render.camera import Camera
from rodent_tpu.render.compiler import compile_obj
from rodent_tpu.render import film as film_mod
from rodent_tpu.render.integrator import render_iteration


def make_textured_scene(d):
    # 8x8 texture, 4-texel checker cells
    img = np.zeros((8, 8, 3), np.uint8)
    img[:4, :4] = 255
    img[4:, 4:] = 255
    png.write_png(d / "checker.png", img)
    (d / "s.obj").write_text("""
mtllib s.mtl
v -1 -1 0
v  1 -1 0
v  1  1 0
v -1  1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
v -0.2 0.9 2.5
v 0.2 0.9 2.5
v 0 1.0 2.6
usemtl wall
f 1/1 2/2 3/3 4/4
usemtl lamp
f 5 7 6
""")
    (d / "s.mtl").write_text("""
newmtl wall
Kd 1 1 1
map_Kd checker.png
newmtl lamp
Kd 0 0 0
Ke 40 40 40
""")
    return str(d / "s.obj")


def test_textured_wall(tmp_path):
    path = make_textured_scene(tmp_path)
    scene = compile_obj(path, max_path_len=2)
    assert "textures" in scene.device
    assert scene.device["textures"].shape[0] == 1
    W, H = 64, 64
    cam = Camera.make((0, 0, 2.0), (0, 0, -1), (0, 1, 0), 60.0, W, H)
    film = film_mod.new_film(W, H)
    for i in range(3):
        film = render_iteration(scene.device, cam, film, W, H, 4, i)
    img = film_mod.tonemap(film, W, H, 3)
    # the wall fills the view: should alternate bright/dark
    mid = img[H // 2, :, 0].astype(np.int32)
    bright = (mid > mid.mean()).astype(np.int32)
    transitions = np.abs(np.diff(bright)).sum()
    assert transitions >= 1, f"expected checker transitions, got {transitions}"
    assert img.std() > 8
