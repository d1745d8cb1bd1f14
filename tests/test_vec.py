"""Property tests for the vec3 layer against closed-form values
(rebuild target: src/math.rs operator surface + GLSL built-ins)."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.core import vec


def test_dot_cross_orthogonality():
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([-2.0, 0.5, 4.0])
    c = vec.cross(a, b)
    assert abs(float(vec.dot(a, c))) < 1e-5
    assert abs(float(vec.dot(b, c))) < 1e-5


def test_cross_handedness():
    x = jnp.array([1.0, 0.0, 0.0])
    y = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(np.asarray(vec.cross(x, y)), [0.0, 0.0, 1.0])


def test_length_and_normalize_batched():
    v = jnp.array([[3.0, 4.0, 0.0], [0.0, 0.0, 2.0]])
    np.testing.assert_allclose(np.asarray(vec.length(v)), [5.0, 2.0])
    n = vec.normalize(v)
    np.testing.assert_allclose(np.asarray(vec.length(n)), [1.0, 1.0], rtol=1e-6)


def test_reflect_mirror():
    # 45-degree incidence on the y=0 plane
    v = jnp.array([1.0, -1.0, 0.0])
    n = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(np.asarray(vec.reflect(v, n)), [1.0, 1.0, 0.0])


def test_reflect_batched_matches_scalar():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(32, 3)).astype(np.float32)
    n = rng.normal(size=(32, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    got = np.asarray(vec.reflect(jnp.asarray(v), jnp.asarray(n)))
    want = v - 2.0 * np.sum(v * n, axis=-1, keepdims=True) * n
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_refract_straight_through():
    # eta ratio 1 → direction unchanged
    v = vec.normalize(jnp.array([1.0, -1.0, 0.0]))
    n = jnp.array([0.0, 1.0, 0.0])
    out = vec.refract(v, n, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), rtol=1e-5, atol=1e-6)


def test_refract_snell_angle():
    # air→glass (eta = 1/1.5) at 45°: sin θ_t = sin 45° / 1.5
    v = vec.normalize(jnp.array([1.0, -1.0, 0.0]))
    n = jnp.array([0.0, 1.0, 0.0])
    out = np.asarray(vec.refract(v, n, 1.0 / 1.5))
    out = out / np.linalg.norm(out)
    sin_t = abs(out[0])
    np.testing.assert_allclose(sin_t, np.sin(np.pi / 4) / 1.5, rtol=1e-5)


def test_near_zero_variants():
    tiny = jnp.array([1e-9, -1e-9, 1e-9])
    assert bool(vec.near_zero(tiny))
    assert not bool(vec.near_zero(jnp.array([1e-3, 0.0, 0.0])))
    # the reference's signed variant calls large-negative vectors "near zero"
    # (src/math.rs:111-114 has no abs) — quirk preserved for parity
    assert bool(vec.near_zero_signed(jnp.array([-5.0, -5.0, -5.0])))


def test_degrees_to_radians():
    np.testing.assert_allclose(float(vec.degrees_to_radians(180.0)), np.pi)


def test_mix_matches_glsl():
    a = jnp.array([1.0, 1.0, 1.0])
    b = jnp.array([0.5, 0.7, 1.0])
    np.testing.assert_allclose(
        np.asarray(vec.mix(a, b, 0.5)), [0.75, 0.85, 1.0], rtol=1e-6
    )


def test_vec3_builder_broadcasts():
    v = vec.vec3(jnp.zeros((4,)), jnp.ones((4,)), 2.0 * jnp.ones((4,)))
    assert v.shape == (4, 3)
