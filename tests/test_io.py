"""Image export tests: PNG round trips, native/python parity, GL flip."""

import numpy as np

from raytracer_tpu import native
from raytracer_tpu.app import io


def rand_img(h=21, w=33, seed=0):
    return np.random.default_rng(seed).random((h, w, 3)).astype(np.float32)


def test_tonemap_clamps_and_flips():
    img = np.array([[[-0.5, 0.5, 1.5]], [[0.0, 1.0, 0.25]]], np.float32)
    u8 = io.tonemap_u8(img, flip_vertical=True)
    # row 0 of output is row -1 of input (GL → scanline)
    np.testing.assert_array_equal(u8[0, 0], [0, 255, 64])
    np.testing.assert_array_equal(u8[1, 0], [0, 128, 255])


def test_python_png_roundtrip():
    img = rand_img()
    data = io._encode_png_py(io.tonemap_u8(img))
    dec = io.decode_png(data)
    np.testing.assert_array_equal(dec, io.tonemap_u8(img))


def test_native_matches_python():
    if native.LIB is None:
        import pytest

        pytest.skip("native library unavailable")
    img = rand_img(48, 64, seed=3)
    dn = io.decode_png(native.encode_png_native(img))
    dp = io.decode_png(io._encode_png_py(io.tonemap_u8(img)))
    np.testing.assert_array_equal(dn, dp)


def test_save_png(tmp_path):
    img = rand_img(8, 8)
    path = str(tmp_path / "out.png")
    io.save_png(path, img)
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    np.testing.assert_array_equal(io.decode_png(data), io.tonemap_u8(img))
