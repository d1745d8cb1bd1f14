"""Picking/autofocus tests (reference semantics: src/glsl.rs:213-239 +
src/state.rs:453-471)."""

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.interact.picking import center_hit, update_cursor_state
from raytracer_tpu.scene import presets
from raytracer_tpu.scene.materials import Material
from raytracer_tpu.scene.spheres import NO_SELECTED_OBJECT_ID, make_scene


def cam_looking_at_sphere(aperture=0.0):
    # default demo camera at (0,0,1) looking down -z; sphere at (0,0,-1)
    cam = presets.demo_camera(160, 90)
    return cam.replace(aperture=jnp.asarray(aperture, jnp.float32))


def test_center_hit_demo_scene():
    scene = presets.demo_scene()
    cam = presets.demo_camera(160, 90)
    ch = center_hit(scene, cam)
    assert bool(ch.hit)
    # the center (blue) sphere, uuid 1, front surface at z=-0.5, 1.5 from cam
    assert int(ch.uuid) == 1
    np.testing.assert_allclose(float(ch.distance), 1.5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ch.point), [0, 0, -0.5], atol=1e-4)


def test_center_miss():
    scene = make_scene([((0, 100, 0), 1.0, Material.diffuse((1, 1, 1)))])
    cam = presets.demo_camera(160, 90)
    ch = center_hit(scene, cam)
    assert not bool(ch.hit)
    assert int(ch.uuid) == NO_SELECTED_OBJECT_ID
    np.testing.assert_allclose(np.asarray(ch.point), [0, 0, 0])


def test_autofocus_only_with_open_aperture():
    scene = presets.demo_scene()
    cam = cam_looking_at_sphere(aperture=0.0)
    new_cam, point, sel = update_cursor_state(scene, cam)
    # aperture 0 → focus unchanged (src/state.rs:456-459)
    np.testing.assert_allclose(
        float(new_cam.focus_distance), float(cam.focus_distance)
    )
    assert int(sel) == 1

    cam = cam_looking_at_sphere(aperture=0.2)
    new_cam, point, sel = update_cursor_state(scene, cam)
    np.testing.assert_allclose(float(new_cam.focus_distance), 1.5, rtol=1e-4)


def test_autofocus_miss_resets_to_10():
    scene = make_scene([((0, 100, 0), 1.0, Material.diffuse((1, 1, 1)))])
    cam = cam_looking_at_sphere(aperture=0.2)
    new_cam, point, sel = update_cursor_state(scene, cam)
    np.testing.assert_allclose(float(new_cam.focus_distance), 10.0)
    assert int(sel) == NO_SELECTED_OBJECT_ID


def test_picking_uses_t_min_zero():
    """get_center_hit uses t_min=0 (src/glsl.rs:226), not the render epsilon:
    a surface exactly at the camera origin still picks."""
    # surface at z = 0.4 + 0.59999 = 0.99999, i.e. 1e-5 in front of the
    # camera origin (0,0,1): inside the render epsilon MIN_T but pickable.
    scene = make_scene([((0.0, 0.0, 0.4), 0.59999, Material.diffuse((1, 1, 1)))])
    cam = presets.demo_camera(160, 90)
    ch = center_hit(scene, cam)
    assert bool(ch.hit)
    # near root accepted: t·|d| ≈ 1e-5 ≪ MIN_T (with MIN_T it'd be the far side)
    assert float(ch.t) < 1e-3
