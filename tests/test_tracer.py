"""Tracer correctness tests: closed-form intersections, material behavior,
bounce-loop semantics (including the documented reference quirks), and
bitwise determinism — the inverse of the reference's empty test suite
(tests/web.rs:10-13 tested 1+1=2)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.camera.camera import derive_camera
from raytracer_tpu.render.options import DebugParams, TraceOptions
from raytracer_tpu.render.tracer import (
    background,
    hit_world,
    render_image_jnp,
    schlick,
    trace_rays,
)
from raytracer_tpu.scene import presets
from raytracer_tpu.scene.materials import Material
from raytracer_tpu.scene.spheres import make_scene


def single_sphere(center=(0, 0, -2), radius=1.0, mat=None):
    return make_scene([(center, radius, mat or Material.diffuse((0.5, 0.5, 0.5)))])


def rays(*pairs):
    o = jnp.array([p[0] for p in pairs], jnp.float32)
    d = jnp.array([p[1] for p in pairs], jnp.float32)
    return o, d


# --- hit_world ---------------------------------------------------------------


def test_hit_sphere_head_on():
    scene = single_sphere()
    o, d = rays(((0, 0, 0), (0, 0, -1)))
    rec = hit_world(o, d, scene)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rec.point[0]), [0, 0, -1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(rec.normal[0]), [0, 0, 1], atol=1e-5)
    assert bool(rec.front_face[0])
    assert int(rec.uuid[0]) == 0


def test_miss_returns_no_hit():
    scene = single_sphere()
    o, d = rays(((0, 0, 0), (0, 1, 0)))
    rec = hit_world(o, d, scene)
    assert not bool(rec.hit[0])
    assert int(rec.uuid[0]) == -1


def test_unnormalized_direction_t_scaling():
    """t is in units of |d| — directions are NOT normalized
    (static/shader.frag:348, the basis-vector ray-gen)."""
    scene = single_sphere()
    o, d = rays(((0, 0, 0), (0, 0, -2)))
    rec = hit_world(o, d, scene)
    np.testing.assert_allclose(float(rec.t[0]), 0.5, rtol=1e-5)


def test_inside_sphere_uses_far_root_and_flips_normal():
    scene = single_sphere(center=(0, 0, 0), radius=1.0)
    o, d = rays(((0, 0, 0), (0, 0, -1)))
    rec = hit_world(o, d, scene)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 1.0, rtol=1e-5)
    assert not bool(rec.front_face[0])
    # outward normal at (0,0,-1) is (0,0,-1); flipped → (0,0,1)
    np.testing.assert_allclose(np.asarray(rec.normal[0]), [0, 0, 1], atol=1e-5)


def test_negative_radius_flips_normals():
    """Negative radius ⇒ normals point inward (shader.frag:170 divides by
    the signed radius) — used by the demo scene (src/state.rs:200,211)."""
    scene = single_sphere(center=(0, 0, -2), radius=-1.0)
    o, d = rays(((0, 0, 0), (0, 0, -1)))
    rec = hit_world(o, d, scene)
    assert bool(rec.hit[0])
    # outward = (p-c)/r = (0,0,1)/(-1) = (0,0,-1); dot(d, outward) > 0 → back
    # face → normal flipped to (0,0,1)
    assert not bool(rec.front_face[0])
    np.testing.assert_allclose(np.asarray(rec.normal[0]), [0, 0, 1], atol=1e-5)


def test_closest_hit_wins():
    scene = make_scene(
        [
            ((0, 0, -5), 1.0, Material.diffuse((1, 0, 0))),
            ((0, 0, -2), 0.5, Material.diffuse((0, 1, 0))),
        ]
    )
    o, d = rays(((0, 0, 0), (0, 0, -1)))
    rec = hit_world(o, d, scene)
    assert int(rec.uuid[0]) == 1
    np.testing.assert_allclose(float(rec.t[0]), 1.5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rec.albedo[0]), [0, 1, 0])


def test_inactive_slots_cannot_be_hit():
    scene = make_scene(
        [((0, 0, -2), 1.0, Material.diffuse((1, 0, 0)))], pad_to=4
    )
    o, d = rays(((0, 0, 0), (0, 0, -1)))
    rec = hit_world(o, d, scene)
    assert bool(rec.hit[0]) and int(rec.uuid[0]) == 0
    # padding sphere at origin radius 1 would engulf the ray start if active
    assert float(rec.t[0]) > 0.9


def test_min_t_epsilon_rejects_self_intersection():
    # ray starting exactly on the surface pointing outward must miss
    scene = single_sphere(center=(0, 0, -2), radius=1.0)
    o, d = rays(((0, 0, -1), (0, 0, 1)))
    rec = hit_world(o, d, scene)
    assert not bool(rec.hit[0])


# --- materials ---------------------------------------------------------------


def trace_one(scene, o, d, key, opts, debug=None):
    color, _ = trace_rays(
        jnp.asarray(o, jnp.float32).reshape(1, 3),
        jnp.asarray(d, jnp.float32).reshape(1, 3),
        scene,
        key,
        opts,
        debug,
    )
    return np.asarray(color[0])


def test_sky_gradient_no_hit(key):
    scene = single_sphere(center=(100, -100, 0), radius=1.0)  # far off-axis
    opts = TraceOptions(max_depth=4)
    up = trace_one(scene, (0, 0, 0), (0, 1e-6, -1), key, opts)
    np.testing.assert_allclose(up, [0.75, 0.85, 1.0], rtol=1e-4)
    top = trace_one(scene, (0, 0, 0), (0, 1, 0.0001), key, opts)
    np.testing.assert_allclose(top, [0.5, 0.7, 1.0], rtol=1e-3)


def test_background_function():
    d = jnp.array([[0.0, -1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(background(d))[0], [1, 1, 1], atol=1e-6)


def test_metal_mirror_deterministic(key):
    """fuzz=0 metal is a perfect mirror: ray at 45° bounces into the sky."""
    scene = make_scene([((0, -100, 0), 99.0, Material.metal((0.8, 0.8, 0.8)))])
    opts = TraceOptions(max_depth=3)
    # downward 45° ray hits the metal ground plane (sphere top ≈ y=-1)
    c = trace_one(scene, (0, 0, 0), (1, -1, 0), key, opts)
    # reflected ray goes up at 45° → sky at y component sin45
    t = 0.5 * (1 / math.sqrt(2) + 1)
    sky = (1 - t) * np.array([1, 1, 1.0]) + t * np.array([0.5, 0.7, 1.0])
    np.testing.assert_allclose(c, 0.8 * sky, rtol=5e-2)


def test_metal_absorbs_below_surface(key):
    """Huge fuzz scatters some rays below the surface → absorbed → black
    (shader.frag:243-246)."""
    scene = make_scene([((0, -101, 0), 100.0, Material.metal((1, 1, 1), fuzz=3.0))])
    opts = TraceOptions(max_depth=2)
    o = jnp.zeros((512, 3), jnp.float32)
    d = jnp.broadcast_to(jnp.array([0.0, -1.0, 0.0]), (512, 3))
    color, _ = trace_rays(o, d, scene, key, opts)
    c = np.asarray(color)
    frac_black = (c.max(axis=-1) == 0).mean()
    assert frac_black > 0.2  # a solid fraction absorbed


def test_glass_never_absorbs(key):
    scene = make_scene([((0, 0, -2), 1.0, Material.glass(1.5))])
    opts = TraceOptions(max_depth=8)
    o = jnp.zeros((256, 3), jnp.float32)
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (256, 3))
    color, _ = trace_rays(o, d, scene, key, opts)
    assert np.asarray(color).min() > 0.0  # every ray ends in sky eventually


def test_glass_total_internal_reflection(key):
    """A grazing ray inside glass (back face, ratio>1) must reflect."""
    scene = make_scene([((0, 0, 0), 1.0, Material.glass(1.5))])
    o, d = rays(((0, 0, 0), (1, 0.05, 0)))
    rec = hit_world(o, d, scene)
    assert not bool(rec.front_face[0])


def test_unknown_material_absorbs(key):
    scene = make_scene([((0, 0, -2), 1.0, Material(7, (1, 1, 1)))])
    opts = TraceOptions(max_depth=3)
    c = trace_one(scene, (0, 0, 0), (0, 0, -1), key, opts)
    np.testing.assert_allclose(c, [0, 0, 0])


def test_schlick_limits():
    np.testing.assert_allclose(float(schlick(1.0, 1.5)), 0.04, atol=1e-3)
    np.testing.assert_allclose(float(schlick(0.0, 1.5)), 1.0, atol=1e-6)


# --- bounce-loop semantics ---------------------------------------------------


def test_exhaust_mode_reference_vs_black(key):
    """Depth exhaustion: reference returns throughput (shader.frag:338),
    book returns black. Trapped between two diffuse spheres, a depth-2 trace
    must exhaust."""
    scene = make_scene(
        [
            ((0, 0, -3), 1.0, Material.diffuse((0.9, 0.9, 0.9))),
            ((0, 0, 3), 1.0, Material.diffuse((0.9, 0.9, 0.9))),
        ]
    )
    # aim straight into sphere 1 with depth 1: first bounce always scatters
    o = jnp.zeros((64, 3), jnp.float32)
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (64, 3))
    ref, _ = trace_rays(o, d, scene, key, TraceOptions(max_depth=1))
    blk, _ = trace_rays(o, d, scene, key, TraceOptions(max_depth=1, exhaust_black=True))
    np.testing.assert_allclose(np.asarray(ref), 0.9, atol=1e-6)
    np.testing.assert_allclose(np.asarray(blk), 0.0, atol=1e-6)


def test_throughput_attenuates_multiplicatively(key):
    """After k diffuse bounces the result is ≤ albedo^k."""
    scene = make_scene([((0, -1000.5, 0), 1000.0, Material.diffuse((0.5, 0.5, 0.5)))])
    o = jnp.zeros((2048, 3), jnp.float32)
    d = jnp.broadcast_to(jnp.array([0.0, -1.0, 0.0]), (2048, 3))
    color, _ = trace_rays(o, d, scene, key, TraceOptions(max_depth=16))
    mean = np.asarray(color).mean()
    assert 0.1 < mean < 0.55  # one bounce minimum → ≤ 0.5 × sky


def test_segments_counted(key):
    scene = presets.two_sphere_scene()
    o = jnp.zeros((16, 3), jnp.float32)
    d = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (16, 3))  # straight to sky
    _, segments = trace_rays(o, d, scene, key, TraceOptions(max_depth=8))
    assert float(segments) == 16.0  # one segment each, then dead


# --- debug AOVs --------------------------------------------------------------


def test_debug_cursor_marker_blue(key):
    scene = single_sphere(center=(0, 0, -2), radius=1.0)
    opts = TraceOptions(max_depth=4, enable_debug=True)
    dbg = DebugParams(
        cursor_point=jnp.array([0.0, 0.0, -1.0]),
        selected_object=jnp.asarray(1000, jnp.int32),
    )
    c = trace_one(scene, (0, 0, 0), (0, 0, -1), key, opts, dbg)
    np.testing.assert_allclose(c, [0, 0, 1])


def test_debug_outline_red_on_grazing(key):
    scene = single_sphere(center=(0, 0, -2), radius=1.0)
    opts = TraceOptions(max_depth=4, enable_debug=True)
    dbg = DebugParams(
        cursor_point=jnp.array([100.0, 100.0, 100.0]),
        selected_object=jnp.asarray(0, jnp.int32),
    )
    # grazing ray: hits near the silhouette → dot(normal, d) > -0.05
    c = trace_one(scene, (0, 0.9999, 0), (0, 0, -1), key, opts, dbg)
    np.testing.assert_allclose(c, [1, 0, 0])
    # head-on hit is not an outline
    c2 = trace_one(scene, (0, 0, 0), (0, 0, -1), key, opts, dbg)
    assert not np.allclose(c2, [1, 0, 0])


# --- full renders ------------------------------------------------------------


def test_render_deterministic_bitwise(key):
    scene, cam, *_ = presets.get_config("two_sphere", 64, 36)
    dcam = derive_camera(cam)
    opts = TraceOptions(max_depth=4)
    a = render_image_jnp(scene, dcam, 64, 36, 4, key, opts)
    b = render_image_jnp(scene, dcam, 64, 36, 4, key, opts)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_render_different_keys_differ(key):
    scene, cam, *_ = presets.get_config("two_sphere", 32, 18)
    dcam = derive_camera(cam)
    opts = TraceOptions(max_depth=4)
    a = render_image_jnp(scene, dcam, 32, 18, 2, key, opts)
    b = render_image_jnp(scene, dcam, 32, 18, 2, jax.random.fold_in(key, 1), opts)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_render_gamma_and_range(key):
    scene, cam, *_ = presets.get_config("two_sphere", 64, 36)
    dcam = derive_camera(cam)
    img = render_image_jnp(scene, dcam, 64, 36, 8, key, TraceOptions(max_depth=8))
    a = np.asarray(img)
    assert a.shape == (36, 64, 3)
    assert a.min() >= 0.0 and a.max() <= 1.0 + 1e-6
    # sky at the top of the frame (row -1 is top in GL orientation)
    top = a[-1].mean(axis=0)
    assert top[2] > top[0]  # blueish


def test_render_stats(key):
    scene, cam, *_ = presets.get_config("two_sphere", 32, 18)
    dcam = derive_camera(cam)
    img, stats = render_image_jnp(
        scene, dcam, 32, 18, 2, key, TraceOptions(max_depth=4), return_stats=True
    )
    assert float(stats["segments"]) >= 32 * 18 * 2  # at least primary rays


def test_russian_roulette_unbiased_and_cheaper(key):
    """RR terminates deep paths early but stays unbiased (converges to the
    same image within noise) and never traces more segments."""
    scene, cam, *_ = presets.get_config("three_sphere", 64, 36)
    dcam = derive_camera(cam)
    base, sb = render_image_jnp(
        scene, dcam, 64, 36, 32, key, TraceOptions(max_depth=16),
        return_stats=True,
    )
    rr, sr = render_image_jnp(
        scene, dcam, 64, 36, 32, key,
        TraceOptions(max_depth=16, russian_roulette_depth=3),
        return_stats=True,
    )
    assert float(sr["segments"]) < float(sb["segments"])
    assert np.abs(np.asarray(base) - np.asarray(rr)).mean() < 0.02


def test_stratified_sampler_lower_error():
    """The stratified sampler must not bias the estimate and should cut
    error: MSE vs a 1024-spp reference at 16 spp, averaged over seeds,
    must not exceed random's (measured ~7-11% better on demo; the bound
    here is the no-regression half of that claim)."""
    import jax

    from raytracer_tpu.render.api import render_image
    from raytracer_tpu.scene import presets as _p

    w, h = 64, 48
    scene, cam, *_ = _p.get_config("demo", w, h)
    ref = np.asarray(
        render_image(scene, cam, w, h, 1024, jax.random.PRNGKey(7),
                     TraceOptions())
    )

    def mse(sampler):
        errs = []
        for seed in range(3):
            img = render_image(
                scene, cam, w, h, 16, jax.random.PRNGKey(100 + seed),
                TraceOptions(sampler=sampler),
            )
            errs.append(float(np.mean((np.asarray(img) - ref) ** 2)))
        return sum(errs) / len(errs)

    m_rand, m_strat = mse("random"), mse("stratified")
    assert m_strat < m_rand * 1.05, (m_rand, m_strat)


def test_bad_sampler_rejected():
    import pytest

    with pytest.raises(ValueError, match="sampler"):
        TraceOptions(sampler="sobol")
