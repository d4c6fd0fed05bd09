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


def make_emissive_tex_scene(d, textured):
    """Same scene twice: lamp Ke as a constant vs as a solid map_Ke —
    renders must match (converter.cpp:794-806 textured-emission path)."""
    img = np.full((8, 8, 3), 255, np.uint8)  # white texture
    png.write_png(d / "white.png", img)
    (d / "e.obj").write_text("""
mtllib e.mtl
v -1 -1 0
v  1 -1 0
v  1  1 0
v -1  1 0
v -0.2 0.9 2.5
v 0.2 0.9 2.5
v 0 1.0 2.6
vt 0 0
vt 1 0
vt 1 1
vt 0 1
usemtl wall
f 1/1 2/2 3/3 4/4
usemtl lamp
f 5/1 7/3 6/2
""")
    lamp = ("Ke 1 1 1\nmap_Ke white.png" if textured
            else "Ke 1 1 1")
    (d / "e.mtl").write_text(f"""
newmtl wall
Kd 0.7 0.7 0.7
newmtl lamp
Kd 0 0 0
{lamp}
""")
    return str(d / "e.obj")


def test_textured_emission_matches_constant(tmp_path):
    """A solid white map_Ke must produce the same image as Ke 1 1 1:
    gamma-decode of 255 is exactly 1.0, and the sampled texture replaces
    the constant intensity in both on_hit and NEE."""
    W, H = 48, 48
    cam = Camera.make((0, 0, 2.0), (0, 0, -1), (0, 1, 0), 60.0, W, H)
    imgs = []
    for textured in (False, True):
        d = tmp_path / ("tex" if textured else "const")
        d.mkdir()
        path = make_emissive_tex_scene(d, textured)
        scene = compile_obj(path, max_path_len=3)
        if textured:
            assert "ke_tex" in scene.device["lights"]
        film = film_mod.new_film(W, H)
        for i in range(2):
            film = render_iteration(scene.device, cam, film, W, H, 2, i)
        imgs.append(np.asarray(film_mod.tonemap(film, W, H, 2), np.int32))
    diff = np.abs(imgs[0] - imgs[1])
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert imgs[1].max() >= 10  # the light actually illuminates
