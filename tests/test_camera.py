"""Camera derivation tests vs. closed-form values replicating
State::update_pipeline (src/state.rs:319-347) and the controller clamps."""

import math

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.camera import controller
from raytracer_tpu.camera.camera import (
    CameraConfig,
    center_ray,
    derive_camera,
    generate_rays,
    pixel_st_grid,
)
from raytracer_tpu.scene import presets


def default_cfg(**kw):
    base = dict(
        origin=(0.0, 0.0, 1.0),
        yaw=-90.0,
        pitch=0.0,
        fov=math.pi / 3.0,
        aperture=0.0,
        focus_distance=0.75,
        aspect_ratio=16.0 / 9.0,
    )
    base.update(kw)
    return CameraConfig.create(**base)


def test_default_camera_basis_matches_reference():
    """Replicates the reference default derivation (src/state.rs:96-125)."""
    dcam = derive_camera(default_cfg())
    # yaw=-90, pitch=0 → front = (0, 0, -1); w = -front = (0,0,1)
    np.testing.assert_allclose(np.asarray(dcam.front), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dcam.w), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dcam.u), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dcam.v), [0, 1, 0], atol=1e-6)
    vp_h = 2.0 * math.tan(math.pi / 6.0)
    vp_w = vp_h * 16.0 / 9.0
    np.testing.assert_allclose(
        np.asarray(dcam.horizontal), [0.75 * vp_w, 0, 0], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(dcam.vertical), [0, 0.75 * vp_h, 0], rtol=1e-5, atol=1e-6)
    expected_llc = np.array([0 - 0.75 * vp_w / 2, -0.75 * vp_h / 2, 1 - 0.75])
    np.testing.assert_allclose(np.asarray(dcam.lower_left_corner), expected_llc, rtol=1e-5, atol=1e-6)
    assert float(dcam.lens_radius) == 0.0


def test_center_ray_points_down_front():
    dcam = derive_camera(default_cfg())
    ray = center_ray(dcam)
    d = np.asarray(ray.direction)
    d = d / np.linalg.norm(d)
    np.testing.assert_allclose(d, [0, 0, -1], atol=1e-6)


def test_pitch_changes_vertical_look():
    dcam = derive_camera(default_cfg(pitch=45.0))
    f = np.asarray(dcam.front)
    np.testing.assert_allclose(f[1], math.sin(math.radians(45.0)), rtol=1e-5)


def test_fov_clamp():
    cfg = controller.set_fov(default_cfg(), 10.0)
    assert float(cfg.fov) <= math.pi * 0.75 + 1e-6
    cfg = controller.set_fov(default_cfg(), -1.0)
    assert float(cfg.fov) >= 0.0001 - 1e-9


def test_pitch_clamp():
    cfg = controller.set_camera_angles(default_cfg(), 0.0, 120.0)
    assert float(cfg.pitch) == 89.0
    cfg = controller.set_camera_angles(default_cfg(), 0.0, -120.0)
    assert float(cfg.pitch) == -89.0


def test_zoom_multiplicative():
    cfg = default_cfg()
    zoomed = controller.zoom(cfg, +1.0)
    np.testing.assert_allclose(float(zoomed.fov), float(cfg.fov) * 1.03, rtol=1e-6)


def test_update_position_wasd():
    cfg = default_cfg()
    keys = controller.KeydownMap(w=True)
    moved = controller.update_position(cfg, keys, dt_ms=100.0)
    # moved along front = (0,0,-1) by speed*dt*fov
    step = controller.MOVEMENT_SPEED * 100.0 * float(cfg.fov)
    np.testing.assert_allclose(
        np.asarray(moved.origin), [0.0, 0.0, 1.0 - step], rtol=1e-5, atol=1e-6
    )
    # no keys → no movement, same object semantics
    same = controller.update_position(cfg, controller.KeydownMap(), dt_ms=100.0)
    np.testing.assert_array_equal(np.asarray(same.origin), np.asarray(cfg.origin))


def test_strafe_uses_unnormalized_cross():
    """The reference strafes along cross(front, vup) WITHOUT normalizing
    (src/state.rs:424,430) — pitched cameras strafe slower. Quirk preserved."""
    cfg = default_cfg(pitch=60.0)
    keys = controller.KeydownMap(d=True)
    moved = controller.update_position(cfg, keys, dt_ms=100.0)
    dist = np.linalg.norm(np.asarray(moved.origin) - np.asarray(cfg.origin))
    step = controller.MOVEMENT_SPEED * 100.0 * float(cfg.fov)
    np.testing.assert_allclose(dist, step * math.cos(math.radians(60.0)), rtol=1e-4)


def test_st_grid_orientation_and_range():
    st = np.asarray(pixel_st_grid(8, 4))
    assert st.shape == (4, 8, 2)
    # fragment centers
    np.testing.assert_allclose(st[0, 0], [0.5 / 8, 0.5 / 4], rtol=1e-6)
    np.testing.assert_allclose(st[-1, -1], [7.5 / 8, 3.5 / 4], rtol=1e-6)


def test_generate_rays_no_jitter_center(key):
    import jax

    dcam = derive_camera(default_cfg())
    st = jnp.array([[0.5, 0.5]])
    ray = generate_rays(dcam, st, key, 100, 100, jitter=False)
    d = np.array(ray.direction[0])
    d = d / np.linalg.norm(d)
    np.testing.assert_allclose(d, [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ray.origin[0]), [0, 0, 1], atol=1e-6)


def test_lens_offset_statistics(key):
    """With aperture > 0 ray origins spread over a disk of radius aperture/2
    in the u-v plane (static/shader.frag:344-350)."""
    dcam = derive_camera(default_cfg(aperture=0.4))
    st = jnp.broadcast_to(jnp.array([0.5, 0.5]), (4000, 2))
    ray = generate_rays(dcam, st, key, 100, 100, jitter=False)
    o = np.asarray(ray.origin)
    r = np.linalg.norm(o - np.array([0, 0, 1.0]), axis=-1)
    assert r.max() <= 0.2 + 1e-5
    assert r.max() > 0.15  # actually spreads
    # rays still converge on the focus plane: origin + dir must hit the same point
    target = o + np.asarray(ray.direction)
    np.testing.assert_allclose(target.std(axis=0), 0.0, atol=1e-5)


def test_yaw_pitch_from_lookat_roundtrip():
    lookfrom = np.array([13.0, 2.0, 3.0])
    lookat = np.zeros(3)
    yaw, pitch = presets.yaw_pitch_from_lookat(lookfrom, lookat)
    cfg = default_cfg(origin=tuple(lookfrom), yaw=yaw, pitch=pitch)
    dcam = derive_camera(cfg)
    want = (lookat - lookfrom) / np.linalg.norm(lookat - lookfrom)
    np.testing.assert_allclose(np.asarray(dcam.front), want, atol=1e-5)
