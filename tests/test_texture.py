"""Texture sampling tests: border handling, nearest/bilinear filtering
(src/render/image.impala semantics)."""
import numpy as np
import jax.numpy as jnp

from rodent_tpu.render import texture as tx


def checker(h=4, w=4):
    img = np.zeros((h, w, 3), np.float32)
    img[::2, ::2] = 1.0
    img[1::2, 1::2] = 1.0
    return img


def test_nearest_texel_centers():
    img = checker()
    uv = jnp.asarray([[0.01, 0.01], [0.26, 0.01], [0.99, 0.99]])
    out = np.asarray(tx.sample_texture(img, uv, filter=tx.FILTER_NEAREST))
    np.testing.assert_allclose(out[0], [1, 1, 1])
    np.testing.assert_allclose(out[1], [0, 0, 0])
    np.testing.assert_allclose(out[2], [1, 1, 1])


def test_repeat_border():
    img = checker()
    uv = jnp.asarray([[1.01, 0.01], [-0.99, 0.01]])
    out = np.asarray(tx.sample_texture(img, uv, filter=tx.FILTER_NEAREST,
                                       border=tx.BORDER_REPEAT))
    np.testing.assert_allclose(out[0], [1, 1, 1])
    np.testing.assert_allclose(out[1], [1, 1, 1])


def test_clamp_border():
    img = checker()
    uv = jnp.asarray([[5.0, 0.0], [-5.0, 0.0]])
    out = np.asarray(tx.sample_texture(img, uv, filter=tx.FILTER_NEAREST,
                                       border=tx.BORDER_CLAMP))
    np.testing.assert_allclose(out[0], checker()[0, -1])
    np.testing.assert_allclose(out[1], checker()[0, 0])


def test_bilinear_interpolates():
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 1] = 1.0  # one white texel
    # exactly between the two top texel centers -> 0.5
    uv = jnp.asarray([[0.5, 0.25]])
    out = np.asarray(tx.sample_texture(img, uv, filter=tx.FILTER_BILINEAR,
                                       border=tx.BORDER_CLAMP))
    np.testing.assert_allclose(out[0], [0.5, 0.5, 0.5], atol=1e-6)
    # at a texel center -> exact value
    uv = jnp.asarray([[0.75, 0.25]])
    out = np.asarray(tx.sample_texture(img, uv, filter=tx.FILTER_BILINEAR,
                                       border=tx.BORDER_CLAMP))
    np.testing.assert_allclose(out[0], [1, 1, 1], atol=1e-6)


def test_gamma_load():
    u8 = np.full((2, 2, 3), 128, np.uint8)
    lin = tx.image_from_u8(u8)
    np.testing.assert_allclose(lin[0, 0, 0], (128 / 255.0) ** 2.2, rtol=1e-5)
