"""Scene SoA pytree tests: construction, padding, presets."""

import jax
import numpy as np

from raytracer_tpu.scene import presets
from raytracer_tpu.scene.materials import DIFFUSE, GLASS, METAL, Material
from raytracer_tpu.scene.spheres import make_scene


def test_demo_scene_matches_reference():
    """The 9-sphere demo scene of src/state.rs:148-257, field by field."""
    s = presets.demo_scene()
    assert s.count == 9
    np.testing.assert_allclose(np.asarray(s.center[0]), [0.0, -100.5, -1.0])
    assert float(s.radius[0]) == 100.0
    np.testing.assert_allclose(np.asarray(s.albedo[0]), [0.75, 0.6, 0.5])
    # negative radii preserved (hollow/flipped shells, src/state.rs:200,211)
    np.testing.assert_allclose(float(s.radius[4]), -0.15, rtol=1e-6)
    np.testing.assert_allclose(float(s.radius[5]), -0.1, rtol=1e-6)
    # materials: glass at index 3 with ri=1.5
    assert int(s.material_type[3]) == GLASS
    assert float(s.refraction_index[3]) == 1.5
    assert int(s.material_type[2]) == METAL
    assert int(s.material_type[0]) == DIFFUSE
    assert bool((np.asarray(s.active) == 1.0).all())


def test_pad_to_masks_extra_slots():
    s = presets.two_sphere_scene().pad_to(8)
    assert s.count == 8
    assert np.asarray(s.active).sum() == 2
    assert float(s.radius[5]) == 1.0  # padding radius keeps 1/r finite
    assert int(s.num_active()) == 2


def test_pad_noop_and_error():
    s = presets.two_sphere_scene()
    assert s.pad_to(2) is s
    try:
        s.pad_to(1)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_cover_scene_size_and_determinism():
    a = presets.cover_scene(seed=0)
    b = presets.cover_scene(seed=0)
    # ~480 spheres: ground + 3 feature + ~22x22 grid minus exclusions
    assert 400 < a.count < 490
    np.testing.assert_array_equal(np.asarray(a.center), np.asarray(b.center))
    np.testing.assert_array_equal(np.asarray(a.albedo), np.asarray(b.albedo))
    # material mix roughly 80/15/5
    mt = np.asarray(a.material_type)
    assert (mt == DIFFUSE).mean() > 0.6
    assert (mt == METAL).mean() > 0.05
    assert (mt == GLASS).mean() > 0.01


def test_scene_is_pytree():
    s = presets.two_sphere_scene()
    doubled = jax.tree.map(lambda x: x * 2, s)
    np.testing.assert_allclose(np.asarray(doubled.radius), np.asarray(s.radius) * 2)


def test_make_scene_uuid_is_index():
    s = make_scene([((0, 0, 0), 1.0, Material.diffuse((1, 0, 0)))])
    assert s.count == 1


def test_all_baseline_configs_resolve():
    for name in presets.BASELINE_CONFIGS:
        scene, cam, w, h, spp, depth = presets.get_config(name)
        assert scene.count >= 1
        assert w > 0 and h > 0 and spp >= 1 and depth >= 1


def test_update_sphere_pure():
    from raytracer_tpu.scene.spheres import update_sphere

    s = presets.two_sphere_scene()
    s2 = update_sphere(s, 0, center=(1, 2, 3), radius=0.25,
                       material=Material.metal((1, 0, 0), fuzz=0.3))
    # original untouched
    np.testing.assert_allclose(np.asarray(s.center[0]), [0, 0, -1])
    np.testing.assert_allclose(np.asarray(s2.center[0]), [1, 2, 3])
    assert float(s2.radius[0]) == 0.25
    assert int(s2.material_type[0]) == METAL
    np.testing.assert_allclose(float(s2.fuzz[0]), 0.3, rtol=1e-6)


def test_add_sphere_reuses_inactive_slot():
    from raytracer_tpu.scene.spheres import add_sphere, remove_sphere

    s = presets.two_sphere_scene().pad_to(4)
    s2 = add_sphere(s, (5, 5, 5), 1.0, Material.glass(1.5))
    assert s2.count == 4  # no shape change
    assert int(s2.num_active()) == 3
    # removing frees the slot again
    s3 = remove_sphere(s2, 2)
    assert int(s3.num_active()) == 2


def test_add_sphere_grows_when_full():
    from raytracer_tpu.scene.spheres import add_sphere

    s = presets.two_sphere_scene()
    s2 = add_sphere(s, (5, 5, 5), 1.0, Material.diffuse((1, 1, 1)))
    assert s2.count == 3
    assert int(s2.num_active()) == 3


def test_edited_scene_renders():
    import jax

    from raytracer_tpu.camera.camera import derive_camera
    from raytracer_tpu.render.options import TraceOptions
    from raytracer_tpu.render.tracer import render_image_jnp
    from raytracer_tpu.scene.spheres import update_sphere

    s = presets.two_sphere_scene()
    s2 = update_sphere(s, 0, material=Material.metal((0.9, 0.1, 0.1)))
    cam = presets.simple_camera(48, 27)
    a = render_image_jnp(s, derive_camera(cam), 48, 27, 2,
                         jax.random.PRNGKey(0), TraceOptions(max_depth=4))
    b = render_image_jnp(s2, derive_camera(cam), 48, 27, 2,
                         jax.random.PRNGKey(0), TraceOptions(max_depth=4))
    assert not np.array_equal(np.asarray(a), np.asarray(b))
