"""AOV debug render tests."""

import numpy as np
import pytest

from raytracer_tpu.render.debug import AOV_MODES, render_aov
from raytracer_tpu.scene import presets

W, H = 64, 36


@pytest.mark.parametrize("mode", AOV_MODES)
def test_aov_shapes_and_range(mode):
    scene, cam, *_ = presets.get_config("three_sphere", W, H)
    img = np.asarray(render_aov(scene, cam, W, H, mode))
    assert img.shape == (H, W, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0 + 1e-6


def test_normal_aov_points_at_camera():
    scene, cam, *_ = presets.get_config("two_sphere", W, H)
    img = np.asarray(render_aov(scene, cam, W, H, "normal"))
    # center pixel hits the front of the sphere: normal ≈ +z → blue ≈ 1
    c = img[H // 2, W // 2]
    assert c[2] > 0.9


def test_depth_aov_monotonic():
    scene, cam, *_ = presets.get_config("two_sphere", W, H)
    img = np.asarray(render_aov(scene, cam, W, H, "depth"))
    # sphere center is closer than ground at frame bottom
    assert img[H // 2, W // 2, 0] > img[2, W // 2, 0] * 0.5
    # sky = 0
    assert img[-1, W // 2].max() == 0.0


def test_uuid_aov_distinct():
    scene, cam, *_ = presets.get_config("three_sphere", W, H)
    img = np.asarray(render_aov(scene, cam, W, H, "uuid"))
    center = img[H // 2, W // 2]
    left = img[H // 2, W // 8]
    assert not np.allclose(center, left)


def test_front_aov_hollow_glass():
    """The hollow glass shell's inner sphere has a negative radius — its
    outward normals point inward, so the camera sees back faces (red)."""
    scene, cam, *_ = presets.get_config("three_sphere", W, H)
    img = np.asarray(render_aov(scene, cam, W, H, "front"))
    # most hit pixels are front faces (green)
    greens = (img[..., 1] > 0.5).sum()
    assert greens > 100


def test_bad_mode_raises():
    scene, cam, *_ = presets.get_config("two_sphere", W, H)
    with pytest.raises(ValueError):
        render_aov(scene, cam, W, H, "bogus")
