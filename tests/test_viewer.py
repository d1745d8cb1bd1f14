"""Terminal viewer tests (the renderable part; raw-terminal loop excluded)."""

import numpy as np

from raytracer_tpu.app.viewer import frame_to_ansi


def test_frame_to_ansi_shape_and_colors():
    img = np.zeros((8, 16, 3), np.float32)
    img[:, :, 0] = 1.0  # all red
    s = frame_to_ansi(img, max_cols=16)
    lines = s.split("\n")
    assert len(lines) == 4  # 8 rows → 4 half-block lines
    assert "38;2;255;0;0" in s  # red foreground
    assert s.endswith("\x1b[0m")


def test_frame_to_ansi_downsamples():
    img = np.random.default_rng(0).random((32, 200, 3)).astype(np.float32)
    s = frame_to_ansi(img, max_cols=50)
    first = s.split("\n")[0]
    assert first.count("▀") == 50


def test_frame_to_ansi_flips_to_scanline():
    img = np.zeros((4, 4, 3), np.float32)
    img[-1, :, 2] = 1.0  # GL top row blue
    s = frame_to_ansi(img, max_cols=4)
    # the blue row must appear in the FIRST output line (top of terminal)
    assert "38;2;0;0;255" in s.split("\n")[0]
