"""Native decode core (native/imgio): build + bit-parity with PIL for the
formats the datasets use (PNG 8/16-bit, PPM, PGM, JPEG)."""

import os
import subprocess

import numpy as np
import pytest
from PIL import Image

IMGIO_DIR = os.path.join(os.path.dirname(__file__), "..", "native", "imgio")


@pytest.fixture(scope="module")
def imgio_mod():
    from craft_tpu.data import imgio

    if not imgio.available():
        r = subprocess.run(["make"], cwd=IMGIO_DIR, capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"imgio build failed: {r.stderr.decode()[:200]}")
        imgio._tried = False  # re-probe after the build
    if not imgio.available():
        pytest.skip("craft_imgio not loadable")
    return imgio


def test_png_rgb_parity(tmp_path, imgio_mod, rng):
    img = rng.randint(0, 255, (37, 53, 3)).astype(np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(img).save(p)
    np.testing.assert_array_equal(imgio_mod.load(p), img)


def test_png_16bit_parity(tmp_path, imgio_mod, rng):
    img = rng.randint(0, 65535, (20, 31)).astype(np.uint16)
    p = str(tmp_path / "x16.png")
    Image.fromarray(img).save(p)
    got = imgio_mod.load(p)
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got, np.array(Image.open(p)))


def test_ppm_pgm_parity(tmp_path, imgio_mod, rng):
    img = rng.randint(0, 255, (14, 23, 3)).astype(np.uint8)
    p = str(tmp_path / "x.ppm")
    Image.fromarray(img).save(p)
    np.testing.assert_array_equal(imgio_mod.load(p), img)

    gray = rng.randint(0, 255, (9, 17)).astype(np.uint8)
    g = str(tmp_path / "x.pgm")
    Image.fromarray(gray).save(g)
    np.testing.assert_array_equal(imgio_mod.load(g), gray)


def test_jpeg_parity(tmp_path, imgio_mod, rng):
    img = rng.randint(0, 255, (32, 48, 3)).astype(np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(img).save(p, quality=90)
    np.testing.assert_array_equal(imgio_mod.load(p),
                                  np.array(Image.open(p)))


def test_png_palette_parity(tmp_path, imgio_mod, rng):
    """Palette PNGs decode to raw indices, exactly like
    np.array(PIL.Image.open) on a mode-'P' image (ADVICE r2)."""
    img = rng.randint(0, 255, (21, 33, 3)).astype(np.uint8)
    p = str(tmp_path / "pal.png")
    Image.fromarray(img).convert("P", palette=Image.ADAPTIVE).save(p)
    got = imgio_mod.load(p)
    want = np.array(Image.open(p))
    assert want.ndim == 2  # PIL yields indices for mode-P
    np.testing.assert_array_equal(got, want)


def test_png_rgba_parity(tmp_path, imgio_mod, rng):
    img = rng.randint(0, 255, (15, 27, 4)).astype(np.uint8)
    p = str(tmp_path / "rgba.png")
    Image.fromarray(img, mode="RGBA").save(p)
    np.testing.assert_array_equal(imgio_mod.load(p),
                                  np.array(Image.open(p)))


def test_load_returns_writable(tmp_path, imgio_mod, rng):
    img = rng.randint(0, 255, (8, 8, 3)).astype(np.uint8)
    p = str(tmp_path / "w.png")
    Image.fromarray(img).save(p)
    out = imgio_mod.load(p)
    assert out.flags.writeable
    out[0, 0, 0] = 7  # must not raise


def test_read_gen_uses_native(tmp_path, imgio_mod, rng):
    from craft_tpu.data import frame_utils

    img = rng.randint(0, 255, (12, 18, 3)).astype(np.uint8)
    p = str(tmp_path / "y.png")
    Image.fromarray(img).save(p)
    out = frame_utils.read_gen(p)
    assert isinstance(out, np.ndarray)
    np.testing.assert_array_equal(np.array(out), img)
    # pil=True still returns a PIL image for callers that need one.
    assert not isinstance(frame_utils.read_gen(p, pil=True), np.ndarray)
