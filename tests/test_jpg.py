"""Clean-room baseline JPEG decoder vs PIL (oracle-only test dep).

The reference loads map_* textures with libjpeg (src/driver/image.cpp
:131-195); io.jpg is our dependency-free equivalent. PIL here plays the
encoder + reference-decoder role the way Embree plays the traversal
oracle."""
import io as _io

import numpy as np
import pytest

PIL_Image = pytest.importorskip("PIL.Image")

from rodent_tpu.io.jpg import read_jpg  # noqa: E402


def _roundtrip(tmp_path, arr, mode="RGB", **save_kw):
    p = tmp_path / "t.jpg"
    PIL_Image.fromarray(arr, mode).save(p, "JPEG", **save_kw)
    ours = read_jpg(str(p))
    ref = np.asarray(PIL_Image.open(p).convert("RGB"), np.uint8)
    return ours, ref


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 255 / max(w - 1, 1)),
                     (y * 255 / max(h - 1, 1)),
                     ((x + y) * 255 / max(w + h - 2, 1))],
                    axis=-1).astype(np.uint8)


@pytest.mark.parametrize("subsampling", [0, 1, 2])  # 4:4:4, 4:2:2, 4:2:0
def test_decode_matches_pil(tmp_path, subsampling):
    arr = _gradient(40, 56)
    ours, ref = _roundtrip(tmp_path, arr, quality=90,
                           subsampling=subsampling)
    assert ours.shape == ref.shape == (40, 56, 3)
    # IDCT/upsampling rounding differs by a few counts between decoders
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 2.0
    assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= 16


def test_decode_noise_with_restarts(tmp_path):
    # 4:4:4 so no chroma upsampling is involved: libjpeg's "fancy"
    # triangle upsampling legitimately differs from our box upsampling
    # on noisy chroma, but the entropy/IDCT path must match exactly
    # (within IDCT rounding)
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (33, 47, 3), np.uint8)
    p = tmp_path / "t.jpg"
    PIL_Image.fromarray(arr, "RGB").save(p, "JPEG", quality=85,
                                         subsampling=0,
                                         restart_marker_blocks=2)
    ours = read_jpg(str(p))
    ref = np.asarray(PIL_Image.open(p).convert("RGB"), np.uint8)
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 1.5


def test_decode_grayscale(tmp_path):
    arr = _gradient(24, 24)[..., 0]
    ours, ref = _roundtrip(tmp_path, arr, mode="L", quality=95)
    assert ours.shape == (24, 24, 3)
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 2.0


@pytest.mark.parametrize("subsampling", [0, 2])
def test_progressive_matches_pil(tmp_path, subsampling):
    """SOF2 progressive (spectral selection + successive approximation,
    the scan script PIL/libjpeg emits by default) must decode like
    libjpeg — the reference's image.cpp:131-195 handles these."""
    arr = _gradient(40, 56)
    ours, ref = _roundtrip(tmp_path, arr, quality=90, progressive=True,
                           subsampling=subsampling)
    assert ours.shape == ref.shape == (40, 56, 3)
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 2.0
    assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= 16


def test_progressive_noise_and_restarts(tmp_path):
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, (33, 47, 3), np.uint8)
    p = tmp_path / "t.jpg"
    PIL_Image.fromarray(arr, "RGB").save(p, "JPEG", quality=85,
                                         subsampling=0, progressive=True,
                                         restart_marker_blocks=2)
    ours = read_jpg(str(p))
    ref = np.asarray(PIL_Image.open(p).convert("RGB"), np.uint8)
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 1.5


def test_progressive_grayscale(tmp_path):
    arr = _gradient(24, 24)[..., 0]
    ours, ref = _roundtrip(tmp_path, arr, mode="L", quality=95,
                           progressive=True)
    assert ours.shape == (24, 24, 3)
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 2.0


def test_texture_loader_dispatches_jpeg(tmp_path):
    from rodent_tpu.render.texture import load_texture
    arr = np.full((8, 8, 3), 128, np.uint8)
    p = tmp_path / "t.jpg"
    PIL_Image.fromarray(arr, "RGB").save(p, "JPEG", quality=95)
    tex = load_texture(str(p))
    assert tex.shape == (8, 8, 3) and tex.dtype == np.float32
    # gamma-2.2 linearized mid-gray
    assert abs(float(tex.mean()) - (128 / 255) ** 2.2) < 0.02
