"""Multi-device sharded rendering tests on the 8-virtual-device CPU mesh:
the sharded render must reproduce the single-device render exactly (same
RNG seeds per (sample, pixel), so results are bit-identical)."""
import numpy as np
import pytest
import jax

from rodent_tpu.parallel import make_mesh, render_iteration_sharded
from rodent_tpu.render.camera import Camera
from rodent_tpu.render.compiler import compile_obj
from rodent_tpu.render import film as film_mod
from rodent_tpu.render.integrator import render_iteration

REF = "/root/reference/testing"
W, H = 32, 32


@pytest.fixture(scope="module")
def cornell():
    return compile_obj(f"{REF}/cornell_box.obj", max_path_len=4)


@pytest.fixture(scope="module")
def single_device_film(cornell):
    cam = Camera.make((0, 1, 2.7), (0, 0, -1), (0, 1, 0), 60.0, W, H)
    film = film_mod.new_film(W, H)
    return np.asarray(render_iteration(cornell.device, cam, film,
                                       W, H, 4, 0))


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_sp,n_px", [(1, 8), (2, 4), (4, 2)])
def test_sharded_matches_single(cornell, single_device_film, n_sp, n_px):
    mesh = make_mesh(n_px=n_px, n_sp=n_sp)
    cam = Camera.make((0, 1, 2.7), (0, 0, -1), (0, 1, 0), 60.0, W, H)
    film = film_mod.new_film(W, H)
    out = render_iteration_sharded(cornell.device, cam, film, W, H, 4, 0,
                                   mesh)
    np.testing.assert_allclose(np.asarray(out), single_device_film,
                               rtol=1e-5, atol=1e-5)


def test_sharded_uneven_pixels(cornell):
    """W*H not divisible by the px axis: the padded strips must not
    change the image (round-3 fix; previously asserted)."""
    w, h = 31, 9  # 279 pixels, 279 % 8 != 0
    mesh = make_mesh(n_px=8, n_sp=1)
    cam = Camera.make((0, 1, 2.7), (0, 0, -1), (0, 1, 0), 60.0, w, h)
    single = np.asarray(render_iteration(
        cornell.device, cam, film_mod.new_film(w, h), w, h, 2, 0))
    out = render_iteration_sharded(cornell.device, cam,
                                   film_mod.new_film(w, h), w, h, 2, 0,
                                   mesh)
    assert out.shape == single.shape
    np.testing.assert_allclose(np.asarray(out), single, rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("n_sp,n_px", [(1, 8), (2, 4)])
def test_persistent_sharded_matches_single(cornell, n_sp, n_px):
    """The sharded persistent-wavefront iteration is bit-identical to the
    single-device persistent film (strip-local pools, disjoint sample
    ranges, psum over sp)."""
    from rodent_tpu.parallel import render_iteration_persistent_sharded
    from rodent_tpu.render.integrator import render_iteration_persistent
    cam = Camera.make((0, 1, 2.7), (0, 0, -1), (0, 1, 0), 60.0, W, H)
    single = np.asarray(render_iteration_persistent(
        cornell.device, cam, film_mod.new_film(W, H), W, H, 4, 0))
    mesh = make_mesh(n_px=n_px, n_sp=n_sp)
    out = render_iteration_persistent_sharded(
        cornell.device, cam, film_mod.new_film(W, H), W, H, 4, 0, mesh)
    np.testing.assert_allclose(np.asarray(out), single, rtol=1e-5,
                               atol=1e-5)


def test_traverse_sharded_uneven_rays(cornell):
    """Ray counts that don't divide the device count are padded with dead
    rays and sliced back."""
    from rodent_tpu.parallel.mesh import traverse_sharded
    from rodent_tpu.traversal.api import make_rays
    from rodent_tpu.traversal.tiled import traverse_tiled
    r = np.random.RandomState(5)
    n = 1021  # prime, not divisible by 8
    org = np.tile(np.asarray([[0, 1, 2.7]], np.float32), (n, 1))
    d = r.randn(n, 3).astype(np.float32)
    rays = make_rays(org, d, np.zeros(n, np.float32),
                     np.full(n, 1e30, np.float32))
    single = traverse_tiled(cornell.device["bvh"], rays)
    sharded = traverse_sharded(cornell.device["bvh"], rays)
    assert sharded["t"].shape == (n,)
    np.testing.assert_array_equal(np.asarray(single["prim_id"]),
                                  np.asarray(sharded["prim_id"]))


def test_traverse_sharded_matches_single(cornell):
    """Ray-sharded traversal over 8 devices must reproduce single-device
    hits exactly (scene replicated, rays split, no collectives)."""
    import jax.numpy as jnp
    from rodent_tpu.parallel.mesh import traverse_sharded
    from rodent_tpu.traversal.api import make_rays
    from rodent_tpu.traversal.tiled import traverse_tiled
    r = np.random.RandomState(3)
    n = 1024
    org = np.tile(np.asarray([[0, 1, 2.7]], np.float32), (n, 1))
    d = r.randn(n, 3).astype(np.float32)
    rays = make_rays(org, d, np.zeros(n, np.float32),
                     np.full(n, 1e30, np.float32))
    single = traverse_tiled(cornell.device["bvh"], rays)
    sharded = traverse_sharded(cornell.device["bvh"], rays)
    np.testing.assert_array_equal(np.asarray(single["t"]),
                                  np.asarray(sharded["t"]))
    np.testing.assert_array_equal(np.asarray(single["prim_id"]),
                                  np.asarray(sharded["prim_id"]))
